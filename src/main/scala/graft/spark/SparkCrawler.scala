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
    fetchError: Option[org.apache.spark.sql.Column] = None,
    /** response bodies for robots.txt / sitemap URLs, (url, body) — the
      * discovery bootstrap (reference _process_robots_txt /
      * _process_sitemap): a fetched robots response yields the domain's
      * home-page link + its `Sitemap:` directives and persists the body
      * into domain_metadata; a fetched sitemap yields its `<loc>` URLs */
    bodies: Option[DataFrame] = None,
    /** redirect chains, (url, redirect_urls array) — fetching `url`
      * lands on the chain's LAST url. J3 canonical solver
      * (Corresponding2First, contrib/canonicalsolvers/basic.py:37-49):
      * the page keeps the dequeued url's identity, links come from the
      * landing page, and every chain member is marked CRAWLED so later
      * links to it never re-crawl */
    redirects: Option[DataFrame] = None,
    /** run store compaction (queue bands + states LSM fold + metadata)
      * every N epochs, between epochs — the operational hook a
      * long-running crawl needs so leaf counts stay bounded (Iceberg
      * rewrite_data_files cadence). 0 = off. */
    compactEveryEpochs: Int = 0) {

  private val spark: SparkSession = frontier.spark
  import spark.implicits._

  /** URL sequence per epoch, in dequeue order. */
  val sequence = scala.collection.mutable.ArrayBuffer.empty[List[String]]
  var epochsRun = 0
  var urlsCrawled = 0L
  var payloadFailures = 0L
  /** wall-seconds of the last epoch's phases (probe attribution only):
    * dequeue+fetch/verify action vs the processCrawled commit pipeline */
  @volatile var lastFetchSec = 0.0
  @volatile var lastProcessSec = 0.0

  def crawlOnce(epochNo: Long): Boolean = {
    val tEpoch0 = System.nanoTime()
    val batch = frontier.nextBatch(maxNextRequests, atEpoch = epochNo)
    // domain buckets of the batch's hosts, computed for free from the
    // collected sequence — lets processCrawled prune its per-epoch
    // domain_metadata reads without an extra job
    var batchDBuckets: Option[Set[Int]] = None
    val n =
      if (collectSequence) {
        // within-batch order follows the queue ordering (a LIFO batch is
        // consumed most-recent-first, like the reference scheduler)
        val orderCols = frontier.ordering match {
          case graft.local.QueueOrdering.Fifo =>
            Seq($"created_at".asc, $"url".asc)
          case graft.local.QueueOrdering.Lifo =>
            Seq($"created_at".desc, $"url".asc)
          case graft.local.QueueOrdering.ScoreCreatedDesc =>
            Seq($"score".desc, $"created_at".asc, $"url".asc)
          case _ => Seq($"score".asc, $"created_at".asc, $"url".asc)
        }
        // coalesce(1) + sortWithinPartitions == a global orderBy here,
        // minus the range-partitioner SAMPLING job a global sort runs
        // first (2 jobs -> 1 per epoch; conformance batches are <= a few
        // hundred cached rows, so the single-partition sort is free)
        val ordered = batch.coalesce(1).sortWithinPartitions(orderCols: _*)
          .select($"url").as[String].collect().toList
        if (ordered.nonEmpty) sequence.append(ordered)
        batchDBuckets = Some(ordered.map { u =>
          graft.core.Hashing.crc32Partition(
            graft.core.UrlUtil.sld(graft.core.UrlUtil.slotKey(u)),
            frontier.partitions)
        }.toSet)
        ordered.length.toLong
      } else if (verifyPayloadOnFetch) {
        // one job: the "fetch" — synthesize the deterministic payload,
        // decode it, check the PSNR/caption invariant (executor-side) —
        // fused with the batch count; rebalanced across all cores (the
        // per-row codec work is the heavy part, not the row count)
        val (cnt, fails) = batch
          .repartition(spark.sparkContext.defaultParallelism)
          .select($"url", $"depth").as[(String, Int)]
          .map { case (url, depth) =>
            val row = graft.images.ImageSynth.rowFor(url, depth, 64, 64)
            (1L, if (graft.images.ImageSynth.verifyRow(url, depth, row)) 0L else 1L)
          }.toDF("c", "f")
          .agg(coalesce(sum($"c"), lit(0L)), coalesce(sum($"f"), lit(0L)))
          .as[(Long, Long)].first()
        payloadFailures += fails
        cnt
      } else batch.count()
    lastFetchSec = (System.nanoTime() - tEpoch0) / 1e9
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
    // redirect resolution: links come from the LANDING url's page; the
    // batch row keeps the dequeued url as its identity (J3)
    val (okContent, aliasSeen, redirectPairs) = redirects match {
      case Some(r) =>
        val withR = ok.join(r, Seq("url"), "left_outer")
        val content = withR.withColumn("__curl",
          coalesce(element_at($"redirect_urls", -1), $"url"))
        val alias = withR
          .select(explode(coalesce($"redirect_urls", array())).as("__aurl"))
          .select(FrontierExprs.url_fingerprint($"__aurl").as("fingerprint"))
        // per-domain redirect bookkeeping: only probe/home requests feed
        // the domain redirect sets (reference _get_domain_after_redirects
        // gates on robots/sitemap/home meta), and only cross-netloc hops
        def isProbeOrHome(u: org.apache.spark.sql.Column) =
          u.endsWith("/robots.txt") || u.rlike("sitemap[^/]*\\.xml$") ||
            FrontierExprs.is_home_page(u)
        val pairs = withR
          .filter($"redirect_urls".isNotNull && isProbeOrHome($"url"))
          .select(FrontierExprs.url_host($"url").as("from_host"),
            FrontierExprs.url_host(element_at($"redirect_urls", -1)).as("to_host"))
          .filter($"from_host" =!= $"to_host")
        (content, Some(alias), Some(pairs))
      case None => (ok.withColumn("__curl", $"url"), None, None)
    }
    val webLinks = okContent
      .join(web.withColumnRenamed("url", "__wurl"),
        okContent("__curl") === col("__wurl"), "left_outer")
      .select($"url".as("parent_url"),
        $"score".as("parent_score"), $"created_at".as("parent_created"),
        $"depth".as("parent_depth"),
        posexplode_outer(coalesce($"outlinks", array())))
      .withColumnRenamed("pos", "link_idx")
      .withColumnRenamed("col", "link_url")
      .filter($"link_url".isNotNull)

    // discovery bootstrap: robots/sitemap responses produce strategy
    // links (home page at 0.8, sitemap probes at 0.9, <loc> URLs) and
    // the robots body for domain_metadata
    val (links, domainData) = bodies match {
      case None => (webLinks, None)
      case Some(bod) =>
        val withBody = ok.join(bod, Seq("url"), "left_outer")
        val isRobots = $"url".endsWith("/robots.txt") && $"body".isNotNull
        val isSitemap = $"url".rlike("sitemap[^/]*\\.xml$") && $"body".isNotNull
        def parentCols = Seq($"url".as("parent_url"),
          $"score".as("parent_score"), $"created_at".as("parent_created"),
          $"depth".as("parent_depth"))
        // Sitemap: directives are only trusted from a VALID robots body
        // (is_valid_robotstxt — reference _process_robots_txt parses and
        // on failure schedules the home page ONLY, discovery/__init__.py:
        // 284-310); the home link is scheduled either way
        val robotsLinks = withBody.filter(isRobots)
          .select(parentCols :+ posexplode(array_union(
            array(regexp_replace($"url", "/robots\\.txt$", "/")),
            when(FrontierExprs.robots_valid($"body"),
              regexp_extract_all($"body", lit("(?m)^Sitemap:\\s*(\\S+)"), lit(1)))
              .otherwise(array().cast("array<string>")))): _*)
          .withColumnRenamed("pos", "link_idx")
          .withColumnRenamed("col", "link_url")
        val sitemapLinks = withBody.filter(isSitemap)
          .select(parentCols :+ posexplode(
            regexp_extract_all($"body", lit("<loc>([^<]+)</loc>"), lit(1))): _*)
          .withColumnRenamed("pos", "link_idx")
          .withColumnRenamed("col", "link_url")
        val dd = withBody.filter(isRobots).select(
          FrontierExprs.sld(FrontierExprs.url_host($"url")).as("domain"),
          $"body".as("robots_body"))
        (webLinks.unionByName(robotsLinks).unionByName(sitemapLinks), Some(dd))
    }
    val tProc0 = System.nanoTime()
    frontier.processCrawled(pages, links, epochNo,
      nPages = if (fetchError.isEmpty) n else -1L, errors = errs,
      domainData = domainData, aliasSeen = aliasSeen,
      redirectPairs = redirectPairs, parentDBuckets = batchDBuckets)
    lastProcessSec = (System.nanoTime() - tProc0) / 1e9
    batch.unpersist()
    if (compactEveryEpochs > 0 && epochNo % compactEveryEpochs == 0) {
      frontier.compactQueue()
      frontier.compactStates()
      frontier.compactMetadata()
      frontier.compactDomainMeta()
    }
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
