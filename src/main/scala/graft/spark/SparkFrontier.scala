package graft.spark

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.spark.FrontierExprs._

/** Scoring strategy as Catalyst column expressions — the Spark-native form
  * of the reference's CrawlingStrategy score functions
  * (tests/backends.py:51-73, frontera/strategy/depth.py:19-42). */
sealed trait ScoreStrategy extends Serializable {
  def seedScore: Column
  def linkScore(parentDepth: Column): Column
}
object ScoreStrategy {
  /** Basic: everything at 1.0 (strategy/basic.py). */
  case object Basic extends ScoreStrategy {
    def seedScore: Column = lit(1.0)
    def linkScore(d: Column): Column = lit(1.0)
  }
  /** test-DFS: 1/(depth+1) — min-queue pops deepest first. */
  case object DFS extends ScoreStrategy {
    def seedScore: Column = lit(1.0)
    def linkScore(d: Column): Column = lit(1.0) / (d.cast(DoubleType) + 2.0)
  }
  /** test-BFS: depth/10 — min-queue pops shallowest first. */
  case object BFS extends ScoreStrategy {
    def seedScore: Column = lit(0.0)
    def linkScore(d: Column): Column = (d.cast(DoubleType) + 1.0) / 10.0
  }
}

/** Spark-native crawl frontier over bucketed snapshot tables.
  *
  * One epoch = one pass of the reference's distributed loop (SURVEY §3):
  * dequeue (batch generator, per-partition top-k with politeness caps) →
  * fetch → page_crawled + links_extracted (strategy worker batch) →
  * states merge + queue append (DB worker). The strategy-worker /
  * DB-worker / spider process split of the reference collapses into
  * stage boundaries of one Spark job; the message-bus topics are the
  * shuffle edges.
  *
  * Scale design (north rule):
  *  - queue bucketed by `partition_id = python_mod(signed_crc32(host), P)`
  *    — all of a host's URLs live in one bucket, politeness state is
  *    co-located, dequeue windows never shuffle across hosts
  *  - states bucketed by fingerprint hash — the URL-seen anti-join
  *    touches only buckets with candidate links; exact-set semantics
  *    (the reference's dedup is exact; a Bloom prefilter would sit in
  *    front of this join, never replace it)
  *  - per-host token-bucket politeness at dequeue (the OverusedBuffer
  *    semantics at epoch granularity: withheld rows stay queued)
  *  - every epoch commits atomically (manifest flip) ⇒ crash-resume
  */
final class SparkFrontier(
    val spark: SparkSession,
    val root: String,
    val partitions: Int = 8,
    val stateBuckets: Int = 8,
    val strategy: ScoreStrategy = ScoreStrategy.BFS,
    /** politeness: max requests per host per epoch (0 = unlimited) */
    val maxPerHost: Int = 0,
    /** salted skew-splitting of hot domains (north rule): the per-host
      * politeness window partitions by (host, salt) with the budget split
      * across salts — a 10^8-URL host becomes `hostSalts` parallel window
      * groups instead of one straggler task, while the host-global cap
      * stays ≤ maxPerHost. Requires maxPerHost % hostSalts == 0. */
    val hostSalts: Int = 1,
    /** conformance mode: single global (score, created) order like the
      * single-partition reference; scale mode: per-partition top-k */
    val globalOrder: Boolean = false,
    /** domain metadata for robots allow/deny (F3): (host, robots_body).
      * Small relative to the frontier ⇒ joined broadcast-style; at 100 TB
      * it lives co-partitioned on the same host buckets as the queue. */
    val robots: Option[DataFrame] = None,
    /** revisit scheduling (S5/2.10): crawled pages re-enter the queue
      * `interval` epochs later (crawl_at visibility at dequeue) */
    val revisitIntervalEpochs: Option[Long] = None,
    /** partitioned Bloom prefilter in front of the exact URL-seen
      * anti-join (north rule); purely join-pruning, set stays exact */
    val useBloom: Boolean = true) extends Serializable {

  import spark.implicits._

  val queueSchema: StructType = StructType(Seq(
    StructField("fingerprint", StringType), StructField("url", StringType),
    StructField("host", StringType), StructField("partition_id", IntegerType),
    StructField("score", DoubleType), StructField("created_at", LongType),
    StructField("depth", IntegerType), StructField("crawl_at", LongType)))
  val statesSchema: StructType = StructType(Seq(
    StructField("fingerprint", StringType), StructField("state", IntegerType),
    StructField("sbucket", IntegerType)))
  /** write-mostly per-document record (S7; reference sqlalchemy
    * models.py:9-30 metadata table) */
  val metadataSchema: StructType = StructType(Seq(
    StructField("fingerprint", StringType), StructField("url", StringType),
    StructField("depth", IntegerType), StructField("score", DoubleType),
    StructField("fetched_epoch", LongType), StructField("status", StringType),
    StructField("partition_id", IntegerType)))

  val queue = new BucketStore(s"$root/queue", "partition_id", partitions)
  val states = new BucketStore(s"$root/states", "sbucket", stateBuckets)
  val metadata = new BucketStore(s"$root/metadata", "partition_id", partitions)
  val bloomSeen = new BloomSeen(s"$root/states")
  queue.emptySchema = Some(queueSchema)
  states.emptySchema = Some(statesSchema)
  metadata.emptySchema = Some(metadataSchema)

  def epoch: Long = math.max(queue.readManifest().epoch, 0L)

  private def sbucketCol(fp: Column): Column =
    pmod(xxhash64(fp), lit(stateBuckets)).cast(IntegerType)

  /** Decorate a url column with the frontier identity columns. */
  private def identity(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("fingerprint", url_fingerprint(col(urlCol)))
      .withColumn("host", url_host(col(urlCol)))
      .withColumn("partition_id", host_partition(col("host"), partitions))

  /** Seed injection (reference add_seeds path, SURVEY §3.3): no states
    * check — seeds schedule unconditionally, like strategy.read_seeds. */
  def addSeeds(seedUrls: Seq[String]): Unit = {
    val df = identity(
      seedUrls.zipWithIndex.toDF("url", "seq"), "url")
      .withColumn("score", strategy.seedScore)
      .withColumn("created_at", $"seq".cast(LongType))
      .withColumn("depth", lit(0))
      .withColumn("crawl_at", lit(0L))
      .select(queueSchema.fieldNames.map(col): _*)
    queue.append(df, epoch, Map("seeds" -> seedUrls.length.toLong))
  }

  /** Seed injection from a DataFrame with a `url` column (streaming /
    * bulk path): seed score from the strategy, depth 0, no states check
    * (matches strategy.read_seeds). */
  def addSeedsDF(urls: DataFrame): Unit = {
    val df = identity(urls.select(col("url")), "url")
      .withColumn("score", strategy.seedScore)
      .withColumn("created_at", pmod(xxhash64(col("url")), lit(1L << 40)))
      .withColumn("depth", lit(0))
      .withColumn("crawl_at", lit(0L))
      .select(queueSchema.fieldNames.map(col): _*)
    queue.append(df, epoch)
  }

  /** Bulk-schedule a frontier (bench/prefill path): df must carry
    * (url, score, depth); identity columns and partitioning are computed
    * here, created_at from a hash (arbitrary-but-deterministic order). */
  def bulkSchedule(df: DataFrame): Unit = {
    val rows = identity(df, "url")
      .withColumn("created_at", pmod(xxhash64(col("url")), lit(1L << 40)))
      .withColumn("crawl_at", lit(0L))
      .select(queueSchema.fieldNames.map(col): _*)
    queue.append(rows, epoch)
  }

  /** Dequeue one batch: the reference get_next_requests hot path
    * (SURVEY §3.1). Returns the batch and removes it from the queue. */
  def nextBatch(maxNextRequests: Int, atEpoch: Long = -1L): DataFrame = {
    // crawl_at visibility (delayed revisit): invisible rows stay queued
    val nowEpoch = if (atEpoch >= 0) atEpoch else epoch
    val q0 = queue.read(spark)
    val q = q0.filter($"crawl_at" <= nowEpoch)
    val rankW =
      if (globalOrder) Window.orderBy($"score".asc, $"created_at".asc)
      else Window.partitionBy($"partition_id")
        .orderBy($"score".asc, $"created_at".asc)
    // one pass: rank within partition (+ per-host politeness rank), tag
    // selected rows; batch and remaining both come from this pass — no
    // second read, no anti-join
    var ranked = q.withColumn("__rank", row_number().over(rankW))
    val selCond =
      if (maxPerHost > 0) {
        require(hostSalts == 1 || maxPerHost % hostSalts == 0,
          s"maxPerHost=$maxPerHost must divide evenly across hostSalts=$hostSalts")
        val (hw, perGroupCap) =
          if (hostSalts > 1) {
            val salt = pmod(xxhash64($"fingerprint"), lit(hostSalts))
            (Window.partitionBy($"host", salt)
              .orderBy($"score".asc, $"created_at".asc),
              maxPerHost / hostSalts)
          } else
            (Window.partitionBy($"host")
              .orderBy($"score".asc, $"created_at".asc), maxPerHost)
        ranked = ranked.withColumn("__hrank", row_number().over(hw))
        $"__rank" <= maxNextRequests && $"__hrank" <= perGroupCap
      } else $"__rank" <= maxNextRequests
    val tagged = ranked.withColumn("__sel", selCond).cache()
    val batch = tagged.filter($"__sel")
      .select(queueSchema.fieldNames.map(col): _*).cache()

    // one job: touched buckets + total + per-partition lineage counters
    val perPartition = batch.groupBy($"partition_id").count()
      .as[(Int, Long)].collect()
    val touched = perPartition.map(_._1).toSet
    if (touched.nonEmpty) {
      // only buckets that lost rows are rewritten; the rest are untouched
      // manifest references (at 10^10 rows the production layout adds
      // score-bucketed files so a rewrite touches only the hot files)
      val remaining = tagged.filter(!$"__sel" &&
          $"partition_id".isInCollection(touched))
        .select(queueSchema.fieldNames.map(col): _*)
        // not-yet-visible rows of the rewritten buckets must ride along
        .union(q0.filter($"crawl_at" > nowEpoch &&
          $"partition_id".isInCollection(touched))
          .select(queueSchema.fieldNames.map(col): _*))
      queue.replaceBuckets(remaining, epoch,
        alsoClear = touched,
        counters = Map("dequeued" -> perPartition.map(_._2).sum) ++
          perPartition.map { case (p, n) => s"dequeued.p$p" -> n })
    }
    tagged.unpersist()
    batch
  }

  /** Process crawl results: `pages` = the fetched batch (must carry
    * fingerprint/url/depth/score/created_at), `links` = extracted links
    * as (parent row ++ link_url, link_idx).
    *
    * Pipeline (reference links_extracted, SURVEY §3.2): identity columns →
    * in-batch first-occurrence dedup → URL-seen anti-join (states ∪ this
    * batch's pages) → strategy score → queue append + states merge. */
  def processCrawled(pages: DataFrame, links: DataFrame, epochNo: Long,
      nPages: Long = -1L): Unit = {
    val pageStates = pages.select($"fingerprint").distinct()
      .withColumn("state", lit(graft.local.States.Crawled))

    val l1 = identity(links, "link_url")
    // F2/F3: filter_extracted_links — robots deny before the states
    // lookup (saves the KV fetch, exactly the reference's motivation)
    val l0 = robots match {
      case Some(dm) =>
        l1.join(broadcast(dm.select($"host", $"robots_body")), Seq("host"), "left_outer")
          .filter(FrontierExprs.robots_can_fetch($"link_url",
            coalesce($"robots_body", lit(""))))
          .drop("robots_body")
      case None => l1
    }
    // first occurrence wins: order links by the dequeue order of their
    // parent, then extraction order — reproduces the sequential schedule
    // order of the reference manager loop
    val firstW = Window.partitionBy($"fingerprint")
      .orderBy($"parent_score".asc, $"parent_created".asc, $"link_idx".asc)
    val deduped = l0.withColumn("__occ", row_number().over(firstW))
      .filter($"__occ" === 1).drop("__occ")

    // URL-seen: partitioned-Bloom prefilter, then the exact anti-join
    // against the states store. Bloom-negative links are definitely
    // unseen and skip the join (at 10^10 rows that's most of the probe
    // side); positives go through the exact join, so the seen SET stays
    // exact. Links to pages crawled in THIS batch are seen too (manager
    // processes page_crawled before the next page's links_extracted) —
    // they're not in the persisted bloom yet, so that check is a separate
    // broadcast anti-join against the (small) batch.
    val notSeenPersisted =
      if (useBloom) {
        val bc = bloomSeen.broadcastFor(spark, (0 until stateBuckets).toSet)
        val mightContain = udf((fp: String, sb: Int) =>
          bc.value.get(sb).exists(_.mightContainString(fp)))
        val withB = deduped.withColumn("__sb", sbucketCol($"fingerprint"))
        val definiteNew = withB.filter(!mightContain($"fingerprint", $"__sb")).drop("__sb")
        val maybeSeen = withB.filter(mightContain($"fingerprint", $"__sb")).drop("__sb")
        definiteNew.unionByName(
          maybeSeen.join(states.read(spark).select($"fingerprint"),
            Seq("fingerprint"), "left_anti"))
      } else
        deduped.join(states.read(spark).select($"fingerprint"),
          Seq("fingerprint"), "left_anti")
    val fresh = notSeenPersisted.join(
      broadcast(pageStates.select($"fingerprint")), Seq("fingerprint"), "left_anti")

    // deterministic created_at = schedule order. Conformance mode uses a
    // global dense rank (single-partition window — fine for oracle runs);
    // scale mode ranks within each host-partition and interleaves
    // (rank*P + pid): parallel, unique, deterministic.
    val epochBase = (epochNo + 1) << 40
    val seqCol =
      if (globalOrder) {
        val w = Window.orderBy($"parent_score".asc, $"parent_created".asc, $"link_idx".asc)
        row_number().over(w).cast(LongType)
      } else {
        val w = Window.partitionBy($"partition_id")
          .orderBy($"parent_score".asc, $"parent_created".asc, $"link_idx".asc)
        row_number().over(w).cast(LongType) * partitions + $"partition_id"
      }
    val scheduled = fresh
      .withColumn("depth", $"parent_depth" + 1)
      .withColumn("score", strategy.linkScore($"parent_depth"))
      .withColumn("created_at", lit(epochBase) + seqCol)
      .withColumn("crawl_at", lit(0L))
      .select(col("link_url").as("url"), $"fingerprint", $"host",
        $"partition_id", $"score", $"created_at", $"depth", $"crawl_at")
      .select(queueSchema.fieldNames.map(col): _*)
      .cache()

    val nScheduled = scheduled.count()
    // revisit: crawled pages re-enter the queue, visible `interval`
    // epochs from now (reference crawl_at, hbase/__init__.py:124)
    val toAppend = revisitIntervalEpochs match {
      case Some(interval) =>
        val revisits = pages
          .withColumn("host", url_host($"url"))
          .withColumn("partition_id", host_partition($"host", partitions))
          .withColumn("crawl_at", lit(epochNo + interval))
          .select(queueSchema.fieldNames.map(col): _*)
        scheduled.union(revisits)
      case None => scheduled
    }
    queue.append(toAppend, epochNo, Map("scheduled" -> nScheduled))

    // metadata sink (S7): one record per fetched document per epoch
    metadata.append(
      pages.select($"fingerprint", $"url", $"depth", $"score")
        .withColumn("fetched_epoch", lit(epochNo))
        .withColumn("status", lit("200"))
        .withColumn("partition_id", host_partition(url_host($"url"), partitions))
        .select(metadataSchema.fieldNames.map(col): _*),
      epochNo)

    // states merge: crawled pages + newly queued links (QUEUED)
    val updates = pageStates
      .union(scheduled.select($"fingerprint")
        .withColumn("state", lit(graft.local.States.Queued)))
      .withColumn("sbucket", sbucketCol($"fingerprint"))
      .select(statesSchema.fieldNames.map(col): _*)
      .cache()
    val touched = updates.select($"sbucket").distinct().as[Int].collect().toSet
    if (touched.nonEmpty) {
      val old = states.readBuckets(spark, Some(touched))
        .join(updates.select($"fingerprint".as("__f")), $"fingerprint" === $"__f", "left_anti")
      val nCrawled = if (nPages >= 0) nPages else pages.count()
      states.replaceBuckets(old.union(updates), epochNo,
        alsoClear = touched,
        counters = Map("crawled" -> nCrawled, "queued" -> nScheduled))
      // refresh the touched buckets' Bloom sidecars from the committed
      // snapshot (production: incremental merge of the update keys)
      if (useBloom)
        bloomSeen.rebuild(states.readBuckets(spark, Some(touched)),
          touched, states.currentVersion)
    }
    scheduled.unpersist()
    updates.unpersist()
  }

  /** URL-seen membership snapshot (conformance checks). */
  def stateSnapshot(): Map[String, Int] =
    states.read(spark).select($"fingerprint", $"state").as[(String, Int)]
      .collect().toMap

  def queueSize(): Long = queue.read(spark).count()
}
