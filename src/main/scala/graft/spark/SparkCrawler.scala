package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Epoch-loop crawl driver — the Spark analog of the reference
  * FrontierTester (frontera/utils/tester.py:13-95). The synthetic web is
  * a links table `(url string, outlinks array<string>)`; "fetching" a URL
  * is a join against it (and, when given, against the image payload
  * table keyed by image_id == url fingerprint — the input_hint shape). */
final class SparkCrawler(
    frontier: SparkFrontier,
    web: DataFrame, // url, outlinks
    maxNextRequests: Int,
    images: Option[DataFrame] = None,
    /** false: don't collect per-URL sequences to the driver (bench mode) */
    collectSequence: Boolean = true,
    /** bench mode: synthesize + decode + verify the image payload for
      * every fetched URL on the executors (the fetch+verify workload) */
    verifyPayloadOnFetch: Boolean = false,
    /** fetch-failure predicate over the batch row (url/host/depth/...):
      * matching rows take the request_error path — ERROR state + error
      * metadata, no links, never re-scheduled */
    fetchError: Option[org.apache.spark.sql.Column] = None) {

  private val spark: SparkSession = frontier.spark
  import spark.implicits._

  /** URL sequence per epoch, in dequeue order. */
  val sequence = scala.collection.mutable.ArrayBuffer.empty[List[String]]
  var epochsRun = 0
  var urlsCrawled = 0L
  var payloadFailures = 0L

  def crawlOnce(epochNo: Long): Boolean = {
    val batch = frontier.nextBatch(maxNextRequests, atEpoch = epochNo)
    val n =
      if (collectSequence) {
        // within-batch order follows the queue ordering (a LIFO batch is
        // consumed most-recent-first, like the reference scheduler)
        val orderCols = frontier.ordering match {
          case graft.local.QueueOrdering.Fifo =>
            Seq($"created_at".asc, $"url".asc)
          case graft.local.QueueOrdering.Lifo =>
            Seq($"created_at".desc, $"url".asc)
          case _ => Seq($"score".asc, $"created_at".asc, $"url".asc)
        }
        val ordered = batch.orderBy(orderCols: _*)
          .select($"url").as[String].collect().toList
        if (ordered.nonEmpty) sequence.append(ordered)
        ordered.length.toLong
      } else if (verifyPayloadOnFetch) {
        // one job: the "fetch" — synthesize the deterministic payload,
        // decode it, check the PSNR/caption invariant (executor-side) —
        // fused with the batch count
        val (cnt, fails) = batch.select($"url", $"depth").as[(String, Int)]
          .map { case (url, depth) =>
            val row = graft.images.ImageSynth.rowFor(url, depth, 64, 64)
            (1L, if (graft.images.ImageSynth.verifyRow(url, depth, row)) 0L else 1L)
          }.toDF("c", "f")
          .agg(coalesce(sum($"c"), lit(0L)), coalesce(sum($"f"), lit(0L)))
          .as[(Long, Long)].first()
        payloadFailures += fails
        cnt
      } else batch.count()
    if (n == 0) { batch.unpersist(); return false }
    urlsCrawled += n

    // request_error path: failed fetches split off before page/link
    // processing (reference core/manager.py:572-580)
    val (ok, errs) = fetchError match {
      case Some(p) =>
        (batch.filter(!p),
          Some(batch.filter(p).withColumn("error",
            concat(lit("fetch failed: "), $"url"))))
      case None => (batch, None)
    }

    // fetch: join the batch against the web graph (and payload table)
    val fetched = images match {
      case Some(img) =>
        ok.join(img, ok("fingerprint") === img("image_id"), "left_outer")
      case None => ok
    }
    val pages = fetched.select($"fingerprint", $"url", $"depth", $"score", $"created_at")
    val links = ok
      .join(web, Seq("url"), "left_outer")
      .select($"url".as("parent_url"),
        $"score".as("parent_score"), $"created_at".as("parent_created"),
        $"depth".as("parent_depth"),
        posexplode_outer(coalesce($"outlinks", array())))
      .withColumnRenamed("pos", "link_idx")
      .withColumnRenamed("col", "link_url")
      .filter($"link_url".isNotNull)
    frontier.processCrawled(pages, links, epochNo,
      nPages = if (fetchError.isEmpty) n else -1L, errors = errs)
    batch.unpersist()
    true
  }

  /** Run until the frontier drains (or maxEpochs). Returns crawl order. */
  def run(maxEpochs: Int = 10000): List[String] = {
    var e = frontier.epoch
    var continue = true
    while (continue && epochsRun < maxEpochs) {
      continue = crawlOnce(e + 1)
      if (continue) { e += 1; epochsRun += 1 }
    }
    sequence.toList.flatten
  }

  /** Run exactly n epochs, advancing the clock even when a batch is
    * empty (revisit mode: future crawl_at rows become visible later). */
  def runEpochs(n: Int): List[String] = {
    var e = frontier.epoch
    (0 until n).foreach { _ =>
      crawlOnce(e + 1)
      e += 1
      epochsRun += 1
    }
    sequence.toList.flatten
  }
}
