package graft.bus

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import graft.core.Hashing

/** S10: the message-bus transport — a durable partitioned log on a shared
  * filesystem, implementing the reference's bus contract
  * (`frontera/core/messagebus.py:8-234`): four streams with the exact
  * partitioning, offset, and flow-control semantics of the Kafka bus
  * (`contrib/messagebus/kafkabus.py`) and the ready/busy marks of the ZMQ
  * bus (`contrib/messagebus/zeromq/__init__.py:175-194`), carrying the S9
  * codec payloads (`graft.codecs`).
  *
  * Spark-first scoping note: INSIDE one engine the shuffle is the
  * exchange — none of this sits on the crawl hot path. The bus exists for
  * the reference's *deployment topology*: non-Spark fetcher processes
  * (spiders) on the feed side, the Spark engine as the strategy+DB worker
  * on the log side, possibly on different machines sharing only a
  * filesystem. Hence a log, not sockets: zero dependencies, durable,
  * resumable, multi-process safe.
  *
  * Layout: `root/<stream>/p<k>/{log,commit,lock}` plus per-consumer-group
  * `consumed-<group>` offset files.
  *  - `log`: append-only frames `[len:int32 BE][payload]`.
  *  - `commit`: 16 bytes — committed (records, bytes) — replaced
  *    atomically (write-temp + ATOMIC_MOVE), so readers never observe a
  *    torn commit and a torn *append* past the committed length is
  *    invisible; the next append overwrites it (producer crash heals).
  *  - `lock`: `FileLock` serializing appends — per-partition total order
  *    across producer processes, like a Kafka partition.
  *
  * Partitioning matches the reference byte-for-byte (golden-tested in
  * `graft.core.Hashing`): the spider log keys by request fingerprint via
  * FingerprintPartitioner (CityHash64 mod n, `partitioners.py:25-34`);
  * the spider feed keys by hostname via Crc32NamePartitioner (signed
  * crc32 python-mod n, `partitioners.py:9-23`) so each host is fetched by
  * at most one spider. Scoring and stats logs are unpartitioned
  * (`messagebus.py:106-146`).
  *
  * Spider-feed availability is the kafkabus rule — a partition is
  * available iff its lag (produced - consumed) is under
  * `maxNextRequests` (`kafkabus.py:197-202`) — intersected with the ZMQ
  * bus's explicit ready/busy marks. Consumed offsets live in the consumer
  * offset file (the "broker state"), auto-committed on poll like a Kafka
  * consumer group; spiders additionally announce them as `Offset`
  * messages on the spider log, which the DB worker forwards via
  * [[SpiderFeed.reportConsumerOffset]] (the ZMQ topology, where the
  * DB worker cannot read the spiders' files). */
object LogBus {
  private[bus] val CommitLen = 16

  /** JVM-wide mutex per lock file. `FileChannel.lock()` guards against
    * other PROCESSES only — a second lock attempt from the same JVM
    * throws OverlappingFileLockException — so in-process producers
    * (multiple spider threads, tests) serialize here first, and the file
    * lock then serializes across processes. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[bus] def jvmLockFor(p: Path): Object =
    jvmLocks.computeIfAbsent(p.toAbsolutePath.toString, _ => new Object)

  private[bus] def readCommit(p: Path): (Long, Long) =
    if (!Files.exists(p)) (0L, 0L)
    else {
      val b = ByteBuffer.wrap(Files.readAllBytes(p))
      if (b.remaining() < CommitLen) (0L, 0L) else (b.getLong(), b.getLong())
    }

  private[bus] def writeCommitAtomic(p: Path, records: Long, bytes: Long): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    val b = ByteBuffer.allocate(CommitLen)
    b.putLong(records).putLong(bytes).flip()
    Files.write(tmp, b.array(), StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

/** One partition of one stream: an append-only framed log with an
  * atomically-replaced commit marker and a cross-process append lock. */
private[bus] final class PartitionLog(dir: Path) {
  import LogBus._
  Files.createDirectories(dir)
  private val logPath = dir.resolve("log")
  private val commitPath = dir.resolve("commit")
  private val lockPath = dir.resolve("lock")

  def committed: (Long, Long) = readCommit(commitPath)

  /** Total-ordered, durable append of `frames`; returns the new record
    * count. Safe across threads AND processes (FileLock). */
  def append(frames: Seq[Array[Byte]]): Long = {
    if (frames.isEmpty) return committed._1
    LogBus.jvmLockFor(lockPath).synchronized {
    val lockRaf = new RandomAccessFile(lockPath.toFile, "rw")
    try {
      val lock = lockRaf.getChannel.lock()
      try {
        val (recs, bytes) = committed
        val raf = new RandomAccessFile(logPath.toFile, "rw")
        try {
          // heal any torn tail from a crashed producer: write from the
          // committed byte length, not the physical file length
          raf.seek(bytes)
          var newBytes = bytes
          val lenBuf = ByteBuffer.allocate(4)
          frames.foreach { f =>
            lenBuf.clear(); lenBuf.putInt(f.length).flip()
            raf.write(lenBuf.array())
            raf.write(f)
            newBytes += 4L + f.length
          }
          raf.getFD.sync()
          writeCommitAtomic(commitPath, recs + frames.size, newBytes)
          recs + frames.size
        } finally raf.close()
      } finally lock.release()
    } finally lockRaf.close()
    }
  }

  /** Read up to `max` frames starting at byte `fromByte`, bounded by the
    * committed length. Returns (frames, nextBytePos). Lock-free. */
  def read(fromByte: Long, max: Int): (Vector[Array[Byte]], Long) = {
    val (_, bytes) = committed
    if (fromByte >= bytes || max <= 0 || !Files.exists(logPath))
      return (Vector.empty, fromByte)
    val raf = new RandomAccessFile(logPath.toFile, "r")
    try {
      raf.seek(fromByte)
      var pos = fromByte
      val out = Vector.newBuilder[Array[Byte]]
      var n = 0
      val lenBuf = new Array[Byte](4)
      while (n < max && pos + 4 <= bytes) {
        raf.readFully(lenBuf)
        val len = ByteBuffer.wrap(lenBuf).getInt
        val frame = new Array[Byte](len)
        raf.readFully(frame)
        out += frame
        pos += 4L + len
        n += 1
      }
      (out.result(), pos)
    } finally raf.close()
  }
}

/** `BaseStreamConsumer` (`core/messagebus.py:8-37`): poll raw messages,
  * expose per-partition consumed offsets. Bound to one partition or — the
  * DB-worker mode — to all of a stream's partitions, drained round-robin.
  * Offsets auto-commit to the group's offset file on poll (Kafka
  * consumer-group semantics), so a restarted consumer resumes. */
final class LogStreamConsumer private[bus] (
    streamDir: Path, group: String, partitionIds: Seq[Int])
    extends StreamConsumer {
  import LogBus._
  private val logs = partitionIds.map(p => p -> new PartitionLog(streamDir.resolve(s"p$p"))).toMap
  // (records, bytes) position per partition, resumed from the group file
  private val pos = scala.collection.mutable.Map[Int, (Long, Long)](
    partitionIds.map { p =>
      p -> readCommit(streamDir.resolve(s"p$p").resolve(s"consumed-$group"))
    }: _*)
  private var rr = 0 // round-robin cursor over partitions

  def getMessages(count: Int = 1): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var got = 0
    var idle = 0
    while (got < count && idle < partitionIds.length) {
      val p = partitionIds(rr % partitionIds.length)
      rr += 1
      val (recs, bytes) = pos(p)
      val (frames, nextByte) = logs(p).read(bytes, count - got)
      if (frames.isEmpty) idle += 1
      else {
        idle = 0
        got += frames.length
        out ++= frames
        pos(p) = (recs + frames.length, nextByte)
        val (nr, nb) = pos(p)
        writeCommitAtomic(
          streamDir.resolve(s"p$p").resolve(s"consumed-$group"), nr, nb)
      }
    }
    out.result()
  }

  /** Consumed offset (record count) for `partitionId`. */
  def getOffset(partitionId: Int): Long = pos(partitionId)._1
}

/** `BaseStreamProducer` (`core/messagebus.py:40-75`): keyed send with the
  * stream's partitioner, buffered per partition, durable on flush. */
final class LogStreamProducer private[bus] (
    streamDir: Path, partitions: Int, partitioner: (String, Int) => Int,
    autoFlushAt: Int = 256) extends StreamProducer {
  private val logs = (0 until partitions)
    .map(p => p -> new PartitionLog(streamDir.resolve(s"p$p"))).toMap
  private val buf = scala.collection.mutable.Map[Int, Vector[Array[Byte]]]()
    .withDefaultValue(Vector.empty)

  /** `key = null` → partition 0 (reference: non-keyed channels). */
  def send(key: String, messages: Array[Byte]*): Unit =
    sendTo(if (key == null) 0 else partitioner(key, partitions), messages: _*)

  /** Explicit-partition send (a Kafka producer's `partition=` arg) — the
    * DB worker's pending-buffer flush path, where the partition was
    * already resolved by the keyed route. */
  def sendTo(partition: Int, messages: Array[Byte]*): Unit = synchronized {
    buf(partition) = buf(partition) ++ messages
    if (buf(partition).length >= autoFlushAt) flushPartition(partition)
  }

  def flush(): Unit = synchronized { buf.keys.toSeq.foreach(flushPartition) }

  private def flushPartition(p: Int): Unit = {
    val frames = buf(p)
    if (frames.nonEmpty) { logs(p).append(frames); buf(p) = Vector.empty }
  }

  /** Produced offset (committed record count) for `partitionId`. */
  def getOffset(partitionId: Int): Long = logs(partitionId).committed._1

  def close(): Unit = flush()
}

/** Spider log (`messagebus.py:78-102`): spiders → strategy/DB workers,
  * keyed by request fingerprint (FingerprintPartitioner). A consumer is
  * bound to one partition (`type="sw"`) or to all (`type="db"`). */
final class SpiderLog private[bus] (dir: Path, val partitions: Int)
    extends SpiderLogStream {
  def producer(): LogStreamProducer =
    new LogStreamProducer(dir, partitions, Hashing.fingerprintPartition)
  def consumer(partitionId: Int, consumerType: String): LogStreamConsumer = {
    val ps = if (partitionId < 0) 0 until partitions else Seq(partitionId)
    new LogStreamConsumer(dir, consumerType, ps)
  }
}

/** Scoring log (`messagebus.py:105-124`): strategy → DB workers,
  * unpartitioned. */
final class ScoringLog private[bus] (dir: Path) extends ScoringLogStream {
  def producer(): LogStreamProducer =
    new LogStreamProducer(dir, 1, (_, _) => 0)
  def consumer(): LogStreamConsumer = new LogStreamConsumer(dir, "db", Seq(0))
}

/** Stats log (`messagebus.py:127-145`): workers → external sinks,
  * unpartitioned. */
final class StatsLog private[bus] (dir: Path) extends StatsLogStream {
  def producer(): LogStreamProducer =
    new LogStreamProducer(dir, 1, (_, _) => 0)
  def consumer(group: String = "stats"): LogStreamConsumer =
    new LogStreamConsumer(dir, group, Seq(0))
}

/** Spider feed (`messagebus.py:148-196`): DB worker → spiders, keyed by
  * hostname (Crc32NamePartitioner) so each host is fetched by at most one
  * spider. Availability = explicit ready/busy marks (zeromq bus)
  * INTERSECTED with offset lag < maxNextRequests (kafka bus). */
final class SpiderFeed private[bus] (
    dir: Path, val partitions: Int, maxNextRequests: Int)
    extends SpiderFeedStream {
  import LogBus._
  private val ready = scala.collection.mutable.Set[Int]((0 until partitions): _*)
  // cached: lag()/availablePartitions() run on the worker's poll loop —
  // constructing a PartitionLog per call would re-run createDirectories
  // and allocate on every 2-10ms iteration
  private val logs =
    (0 until partitions).map(p => p -> new PartitionLog(dir.resolve(s"p$p"))).toMap

  def producer(): LogStreamProducer =
    new LogStreamProducer(dir, partitions, Hashing.crc32Partition)
  def consumer(partitionId: Int): LogStreamConsumer =
    new LogStreamConsumer(dir, "spider", Seq(partitionId))

  /** The ZMQ-topology offset report path: the DB worker observed a
    * spider's `Offset` message on the spider log and forwards it here.
    * Written to its OWN file (`reported-spider`), not the consumer's
    * auto-commit file: the spider owns `consumed-spider` (single
    * writer), so a worker report can never race it into a stale or torn
    * byte position — `lag` takes the max of the two record counts.
    * Reports are worker-local (one flow-control observer per feed
    * partition, like the reference's batchgen ownership), so the
    * monotonic check below is single-writer too. */
  def reportConsumerOffset(partitionId: Int, offset: Long): Unit = {
    val f = dir.resolve(s"p$partitionId").resolve("reported-spider")
    val (recs, _) = readCommit(f)
    if (offset > recs) writeCommitAtomic(f, offset, 0L)
  }

  private def consumedOffset(p: Int): Long =
    math.max(readCommit(dir.resolve(s"p$p").resolve("consumed-spider"))._1,
      readCommit(dir.resolve(s"p$p").resolve("reported-spider"))._1)

  def lag(p: Int): Long =
    math.max(0L, logs(p).committed._1 - consumedOffset(p))

  /** `kafkabus.py:197-202` ∧ `zeromq/__init__.py:187-194`. */
  def availablePartitions(): Set[Int] =
    (0 until partitions)
      .filter(p => ready.contains(p) && lag(p) < maxNextRequests).toSet

  def markReady(partitionId: Int): Unit = ready += partitionId
  def markBusy(partitionId: Int): Unit = ready -= partitionId
}

/** `BaseMessageBus` (`core/messagebus.py:200-234`): the stream factory.
  * `spiderLogPartitions` = number of strategy workers
  * (SPIDER_LOG_PARTITIONS); `spiderFeedPartitions` = number of spiders
  * (SPIDER_FEED_PARTITIONS); `maxNextRequests` = the per-partition feed
  * lag bound (MAX_NEXT_REQUESTS, `kafkabus.py:256`). */
final class LogBus(rootDir: String, spiderLogPartitions: Int = 1,
    spiderFeedPartitions: Int = 1, maxNextRequests: Int = 256)
    extends MessageBus {
  private val root = Paths.get(rootDir)
  val spiderLog = new SpiderLog(root.resolve("spider-log"), spiderLogPartitions)
  val scoringLog = new ScoringLog(root.resolve("scoring-log"))
  val statsLog = new StatsLog(root.resolve("stats-log"))
  val spiderFeed =
    new SpiderFeed(root.resolve("spider-feed"), spiderFeedPartitions, maxNextRequests)
}
