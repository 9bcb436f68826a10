package graft.bus

/** The transport seam of the bus topology — the reference's abstract bus
  * interfaces (`frontera/core/messagebus.py:8-234`: `BaseStreamProducer`/
  * `BaseStreamConsumer` at :8-75, the four stream factories at :78-196,
  * `BaseMessageBus` at :200-234) as Scala traits, so the spider and the
  * Spark worker ([[BusSpider]], [[SparkBusWorker]]) depend only on the
  * contract and a broker-backed transport is a drop-in.
  *
  * A Kafka implementation maps 1:1 (reference
  * `contrib/messagebus/kafkabus.py`):
  *  - [[StreamProducer]] → `KafkaProducer`; the keyed `send` carries the
  *    stream's partitioner exactly as kafkabus keys its producers
  *    (`kafkabus.py:171-205`: spider feed = Crc32NamePartitioner over
  *    hostname when `QUEUE_HOSTNAME_PARTITIONING`, spider log =
  *    FingerprintPartitioner over the request fingerprint);
  *  - [[StreamConsumer]] → `KafkaConsumer` in a consumer group; the
  *    `group` strings here ("db"/"sw"/"spider") are the reference's group
  *    ids (`kafkabus.py:54-63`), and `getOffset` is the committed
  *    group offset;
  *  - [[SpiderFeedStream.availablePartitions]] → the lag rule computed
  *    from `offsets_fetcher` (`kafkabus.py:197-202`: lag <
  *    max_next_requests), intersected with the ZMQ topology's explicit
  *    ready/busy marks (`zeromq/__init__.py:187-194`) — a pure-Kafka bus
  *    leaves every partition marked ready and the lag rule alone gates;
  *  - [[SpiderFeedStream.reportConsumerOffset]] → the ZMQ `Offset`
  *    message path; a Kafka bus may no-op it (the broker already tracks
  *    committed offsets) — [[SpiderFeedStream.lag]] takes the max of
  *    both signals so either source suffices.
  *
  * [[LogBus]] is the zero-dependency default implementation (durable
  * partitioned log on a shared filesystem); `BusTopologySpec` exercises
  * the whole topology strictly through these traits.
  */
trait StreamProducer {
  /** Keyed send routed by the stream's partitioner; `key = null` →
    * partition 0 (reference non-keyed channels). */
  def send(key: String, messages: Array[Byte]*): Unit
  /** Explicit-partition send (a Kafka producer's `partition=` arg). */
  def sendTo(partition: Int, messages: Array[Byte]*): Unit
  /** Make everything sent so far durable/visible. */
  def flush(): Unit
  /** Produced (committed) record count for `partitionId`. */
  def getOffset(partitionId: Int): Long
  def close(): Unit
}

trait StreamConsumer {
  /** Poll up to `count` raw frames across this consumer's partitions;
    * consumed offsets auto-commit (Kafka consumer-group semantics). */
  def getMessages(count: Int): Vector[Array[Byte]]
  /** Consumed offset (record count) for `partitionId`. */
  def getOffset(partitionId: Int): Long
}

/** Spider log (`messagebus.py:78-102`): spiders → workers, keyed by
  * request fingerprint (FingerprintPartitioner). */
trait SpiderLogStream {
  def partitions: Int
  def producer(): StreamProducer
  /** `partitionId < 0` = all partitions (the DB-worker mode);
    * `consumerType` is the consumer-group id ("sw"/"db"). */
  def consumer(partitionId: Int, consumerType: String): StreamConsumer
}

/** Scoring log (`messagebus.py:105-124`): strategy → DB workers,
  * unpartitioned. */
trait ScoringLogStream {
  def producer(): StreamProducer
  def consumer(): StreamConsumer
}

/** Stats log (`messagebus.py:127-145`): workers → external sinks. */
trait StatsLogStream {
  def producer(): StreamProducer
  def consumer(group: String): StreamConsumer
}

/** Spider feed (`messagebus.py:148-196`): DB worker → spiders, keyed by
  * hostname so each host is fetched by at most one spider. */
trait SpiderFeedStream {
  def partitions: Int
  def producer(): StreamProducer
  def consumer(partitionId: Int): StreamConsumer
  /** Partitions a batch may be produced to right now:
    * ready/busy ∧ lag < maxNextRequests. */
  def availablePartitions(): Set[Int]
  /** produced − consumed records for `p` (≥ 0). */
  def lag(p: Int): Long
  /** Forwarded spider `Offset` message (the ZMQ flow-control path). */
  def reportConsumerOffset(partitionId: Int, offset: Long): Unit
  def markReady(partitionId: Int): Unit
  def markBusy(partitionId: Int): Unit
}

/** `BaseMessageBus` (`core/messagebus.py:200-234`): the stream factory
  * the deployment topology is wired against. */
trait MessageBus {
  def spiderLog: SpiderLogStream
  def scoringLog: ScoringLogStream
  def statsLog: StatsLogStream
  def spiderFeed: SpiderFeedStream
}
