package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{SparkFrontier, ScoreStrategy}

/** Phase-level timing probe for the hot path (not the graded bench):
  * breaks one drain into dequeue vs fetch-verify vs per-epoch commit
  * time so regressions in the per-epoch fixed cost are attributable.
  * Usage: runMain graft.BenchProbe [threads] [nUrls] [totalBatch] */
object BenchProbe {
  /** Plain-threads scaling probe of the image verify kernel (isolates
    * codec/GC scaling from Spark). */
  private def kernelProbe(): Unit = {
    def run(nt: Int, perThread: Int): Double = {
      val ths = (0 until nt).map { t =>
        new Thread(() => {
          var i = 0
          while (i < perThread) {
            val url = s"http://host${(t * perThread + i) % 600}.example/p/${t * perThread + i}"
            val row = graft.images.ImageSynth.rowFor(url, 1, 64, 64)
            if (!graft.images.ImageSynth.verifyRow(url, 1, row)) println("FAIL")
            i += 1
          }
        })
      }
      val t0 = System.nanoTime()
      ths.foreach(_.start()); ths.foreach(_.join())
      nt.toLong * perThread / ((System.nanoTime() - t0) / 1e9)
    }
    run(8, 500) // warmup
    val r32 = run(32, 2000)
    val r8 = run(8, 2000)
    val r32b = run(32, 2000)
    println(f"[kernel] urls/s @8=$r8%.0f @32=${math.max(r32, r32b)}%.0f eff=${math.max(r32, r32b) / r8 / 4}%.3f")
  }

  /** Per-epoch cost probe of the full crawl pipeline. Default = the
    * q_frontier_crawl_dfs shape (15 URLs over 15 epochs = pure fixed
    * cost); `crawl big [threads]` = the bench pipeline shape (600-host
    * benchGraph, payload verify on) so the at-scale epoch phases are
    * attributable. Prints seconds + Spark job count + manifest commits
    * per epoch. */
  private def crawlProbe(big: Boolean, threads: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions",
        sys.env.get("GRAFT_PROBE_SHUFFLE").map(_.toInt).getOrElse(threads * 3))
      .config("spark.sql.adaptive.enabled",
        !sys.env.contains("GRAFT_PROBE_NO_AQE"))
      .config("spark.sql.codegen.wholeStage",
        (!sys.env.contains("GRAFT_PROBE_NO_CODEGEN")).toString)
      .config("spark.sql.codegen.factoryMode",
        if (sys.env.contains("GRAFT_PROBE_NO_CODEGEN")) "NO_CODEGEN"
        else "FALLBACK")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val verbose = sys.env.contains("GRAFT_PROBE_JOBS")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val name = desc + " :: " +
          js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        jobStarts.put(js.jobId, (js.time, name))
        if (verbose) println(s"[job] $name")
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(je.jobId)
        if (verbose && s != null)
          println(f"[jobend] ${(je.time - s._1) / 1e3}%8.2f s  ${s._2.take(120)}")
      }
    })
    val rounds = sys.env.get("GRAFT_PROBE_ROUNDS").map(_.toInt).getOrElse(1)
    for (round <- 1 to rounds) {
    val root = java.nio.file.Files.createTempDirectory("graft-cprobe").toString
    val disc = !big && sys.env.contains("GRAFT_PROBE_DISC")
    val graph =
      if (big) graft.local.Graphs.benchGraph(600, 4, 8)
      else graft.local.Graphs.site01
    val frontier =
      if (big) new SparkFrontier(spark, root,
        partitions = spark.sparkContext.defaultParallelism,
        stateBuckets = spark.sparkContext.defaultParallelism,
        strategy = ScoreStrategy.BFS, globalOrder = false)
      else if (disc) new SparkFrontier(spark, root, partitions = 4,
        stateBuckets = 4, strategy = ScoreStrategy.Basic, globalOrder = true,
        ordering = graft.local.QueueOrdering.ScoreCreatedDesc,
        asyncDequeueCommit = sys.env.contains("GRAFT_PROBE_ASYNC"),
        useBloom = !sys.env.contains("GRAFT_PROBE_NOBLOOM"),
        discovery = Some(graft.spark.DiscoveryConfig(maxPagesPerDomain = 100,
          sameDomainOnly = true, justifyScores = true)))
      else new SparkFrontier(spark, root, partitions = 4,
        stateBuckets = 4, strategy = ScoreStrategy.DFS, globalOrder = true,
        asyncDequeueCommit = sys.env.contains("GRAFT_PROBE_ASYNC"),
        useBloom = !sys.env.contains("GRAFT_PROBE_NOBLOOM"))
    import spark.implicits._
    // GRAFT_PROBE_DISC: the q_frontier_discovery shape (robots + sitemap
    // probes, budget joins, domain-meta merges — the discovery epoch's
    // extra fixed cost, attributable per epoch)
    val web =
      if (disc) Seq(("http://www.x.com/",
        Seq("http://www.x.com/a", "http://www.x.com/private/1",
          "http://www.x.com/b", "http://other.com/x")))
        .toDF("url", "outlinks").cache()
      else graft.spark.GraphTables.webDF(spark, graph).cache()
    web.count()
    val bodies =
      if (disc) Some(Seq(
        ("http://www.x.com/robots.txt",
          "User-agent: *\nDisallow: /private\nSitemap: http://www.x.com/sitemap.xml\n"),
        ("http://www.x.com/sitemap.xml",
          "<urlset><url><loc>http://www.x.com/c</loc></url>" +
            "<url><loc>http://www.x.com/d</loc></url></urlset>"))
        .toDF("url", "body"))
      else None
    if (disc) frontier.addSeedsDiscovery(Seq("http://www.x.com/somewhere"))
    else frontier.addSeeds(graph.seeds)
    val crawler =
      if (big) new graft.spark.SparkCrawler(frontier, web, 16384,
        collectSequence = false, verifyPayloadOnFetch = true)
      else if (disc) new graft.spark.SparkCrawler(frontier, web, 100,
        bodies = bodies)
      else new graft.spark.SparkCrawler(frontier, web, 10)
    var e = frontier.epoch
    var continue = true
    val tAll = System.nanoTime()
    def versions(): Seq[Long] = Seq(frontier.queue, frontier.states,
      frontier.metadata, frontier.domainMeta).map(_.currentVersion)
    while (continue) {
      val j0 = jobs.get()
      val v0 = versions()
      val t0 = System.nanoTime()
      continue = crawler.crawlOnce(e + 1)
      if (continue) {
        e += 1
        val commits = versions().zip(v0).map { case (a, b) => a - b }.sum
        println(f"[crawl] epoch$e%-3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  ${jobs.get() - j0}%3d jobs  $commits%2d manifest commits  (dequeue scan=${frontier.lastScan.scanSec}%.2f rewrite=${frontier.lastScan.rewriteSec}%.2f fetch=${crawler.lastFetchSec}%.2f process=${crawler.lastProcessSec}%.2f, ${crawler.urlsCrawled} urls so far)")
      }
    }
    println(f"[crawl] TOTAL ${(System.nanoTime() - tAll) / 1e9}%6.2f s, ${crawler.urlsCrawled} urls, ${jobs.get()} jobs")
    val cm = org.apache.spark.metrics.source.CodegenMetrics
    println(f"[codegen] round $round compiled units=${cm.METRIC_COMPILATION_TIME.getCount}%d")
    }
    spark.stop()
  }

  /** Time individual suite queries (same noop-sink discipline as the
    * bench): runMain graft.BenchProbe queries <sfDir> <q1,q2,...> [rounds] */
  private def queriesProbe(sfDir: String, names: Seq[String], rounds: Int): Unit = {
    // derive threads like Bench.session does — a hardcoded local[32]
    // oversubscribes smaller hosts and makes timings incomparable
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads * 3)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to rounds; name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[q] round$r $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }

  /** Dump .explain("formatted") of suite queries to a directory (the
    * plan evidence for the optimization-round deliverables):
    * runMain graft.BenchProbe plans <sfDir> <outDir> [q1,q2,... | all] [suffix] */
  private def plansProbe(sfDir: String, outDir: String, names: Seq[String],
      suffix: String): Unit = {
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads * 3)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), plan)
      println(s"[plan] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("kernel")) { kernelProbe(); return }
    if (args.headOption.contains("plans")) {
      val names =
        if (args.lift(3).forall(_ == "all")) SparkEntry.queries.keys.toSeq.sorted
        else args(3).split(',').toSeq
      plansProbe(args(1), args(2), names, args.lift(4).getOrElse("_before"))
      return
    }
    if (args.headOption.contains("queries")) {
      queriesProbe(args(1), args(2).split(',').toSeq,
        args.lift(3).map(_.toInt).getOrElse(2))
      return
    }
    if (args.headOption.contains("crawl")) {
      crawlProbe(big = args.lift(1).contains("big"),
        threads = args.lift(2).map(_.toInt).getOrElse(
          if (args.lift(1).contains("big")) 32 else 4))
      return
    }
    val threads = args.headOption.map(_.toInt).getOrElse(32)
    val n = args.lift(1).map(_.toLong).getOrElse(400000L)
    val totalBatch = args.lift(2).map(_.toInt).getOrElse(262144)
    val storeParts = args.lift(3).map(_.toInt).getOrElse(threads)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val frontier = new SparkFrontier(spark, root, partitions = storeParts,
      stateBuckets = storeParts, strategy = ScoreStrategy.BFS, globalOrder = false)
    var t0 = System.nanoTime()
    frontier.bulkSchedule(spark.range(n).select(
      concat(lit("http://host"), $"id" % 600, lit(".example/p/"), $"id").as("url"),
      (($"id" % 100).cast("double") / 100.0).as("score"),
      ($"id" % 4).cast("int").as("depth")))
    def lap(tag: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[probe] $tag%-28s ${(t1 - t0) / 1e9}%8.2f s")
      t0 = t1
    }
    lap("prefill")
    println(s"[probe] raw full-queue rows = ${frontier.queue.read(spark).count()}")
    lap("raw read+count (all files)")
    var continue = true
    var epochN = 0
    while (continue) {
      epochN += 1
      val batch = frontier.nextBatch(totalBatch / storeParts)
      val cnt0 = batch.count()
      lap(f"epoch$epochN dequeue+count (scan ${frontier.lastScan.scannedPaths}/${frontier.lastScan.totalPaths}, scanSec=${frontier.lastScan.scanSec}%.2f rewriteSec=${frontier.lastScan.rewriteSec}%.2f)")
      if (cnt0 == 0) continue = false
      else {
        println(s"[probe] batch partitions = ${batch.rdd.getNumPartitions}")
        t0 = System.nanoTime()
        val cnt = batch.select($"url", $"depth").as[(String, Int)]
          .map { case (url, depth) =>
            val row = graft.images.ImageSynth.rowFor(url, depth, 64, 64)
            if (graft.images.ImageSynth.verifyRow(url, depth, row)) 1L else 0L
          }.reduce(_ + _)
        lap(s"epoch$epochN verify as-is ($cnt urls)")
        val cnt2 = batch.repartition(threads).select($"url", $"depth").as[(String, Int)]
          .map { case (url, depth) =>
            val row = graft.images.ImageSynth.rowFor(url, depth, 64, 64)
            if (graft.images.ImageSynth.verifyRow(url, depth, row)) 1L else 0L
          }.reduce(_ + _)
        lap(s"epoch$epochN verify repart ($cnt2 urls)")
      }
      batch.unpersist()
    }
    spark.stop()
  }
}
