package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extra (non-graded) benchmarks for the optimization rounds — noop-sink
  * isolation of sub-stages per guide §1.4, so the numbers cited in
  * OPTIMIZATION_r06.md are attributable. The graded harness (Bench.scala)
  * is frozen; this main adds measurements without touching it.
  *
  * Usage: runMain graft.BenchExtra <mode> [args]
  *   minhash <sfDir>   — stage-by-stage timing of the 128/16 MinHash-LSH
  *   clusters <sfDir>  — per-round timing of the label propagation
  */
object BenchExtra {

  private def session(): SparkSession = {
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads * 3)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[extra] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** The q_dedup_minhash_lsh_128 pipeline cut open at each stage. */
  private def minhashStages(spark: SparkSession, dir: String): Unit = {
    val perms = 128; val bands = 16
    val rows = perms / bands
    val groups = (perms + 3) / 4
    for (round <- 1 to 2) {
      val para = spark.sparkContext.defaultParallelism
      val toks = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(para)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val digs = toks.select(col("doc_id") +:
        (0 until groups).map(g =>
          md5(concat(col("tok"), lit(s"|$g"))).as(s"d$g")): _*)
      val minCols = (0 until perms).map(i =>
        min(conv(substring(col(s"d${i / 4}"), (i % 4) * 8 + 1, 8), 16, 10)
          .cast("long")).as(s"h$i"))
      val sigs = time(s"r$round sigs agg (localCheckpoint)") {
        digs.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
          .localCheckpoint()
      }
      val banded = sigs.repartition(para).select(col("doc_id"), explode(array(
        (0 until bands).map { b =>
          val rowCols = (0 until rows).map(r =>
            lpad(lower(hex(col(s"h${b * rows + r}"))), 8, "0"))
          md5(concat(rowCols: _*))
        }: _*)).as("bk"))
      time(s"r$round banded noop")(noop(banded))
      val joined = banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      time(s"r$round join (no distinct) count") {
        println(s"  join rows = ${joined.count()}")
      }
      time(s"r$round full (join+distinct) noop")(noop(joined.distinct()))
    }
  }

  /** Per-round cost of the connected-components label propagation
    * (a timing-instrumented copy of PipelineOps.dedupClusters). */
  private def clusterRounds(spark: SparkSession, dir: String): Unit = {
    val pairs = time("pairs (simhash near-dup) checkpoint") {
      graft.ops.PipelineOps.qDedupSimhashPairs(spark, dir).localCheckpoint()
    }
    time("dedupClusters total") {
      noop(graft.ops.PipelineOps.dedupClusters(pairs, "doc_a", "doc_b"))
    }
    // instrumented replay
    val edges = time("edges build") {
      pairs.select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct().repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    }
    println(s"  edges=${edges.count()} parts=${edges.rdd.getNumPartitions}")
    var labels = time("labels init") {
      edges.select(col("src").as("node")).distinct()
        .withColumn("cluster_id", col("node")).localCheckpoint()
    }
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 40) {
      val t0 = System.nanoTime()
      val viaEdges = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("cluster_id"),
          lit(null).cast(labels.schema("cluster_id").dataType).as("old"))
      val withJump =
        if (rounds == 0) viaEdges
        else viaEdges.union(labels.as("l1")
          .join(labels.as("l2"), col("l1.cluster_id") === col("l2.node"))
          .select(col("l1.node").as("node"), col("l2.cluster_id").as("cluster_id"),
            lit(null).cast(labels.schema("cluster_id").dataType).as("old")))
      val next = labels.select(col("node"), col("cluster_id"),
          col("cluster_id").as("old"))
        .union(withJump)
        .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"),
          min(col("old")).as("old"))
        .localCheckpoint()
      val tCkpt = System.nanoTime()
      changed = next.filter(col("cluster_id") =!= col("old")).count()
      labels = next.select(col("node"), col("cluster_id"))
      rounds += 1
      println(f"  round $rounds: ckpt=${(tCkpt - t0) / 1e9}%5.2f s count=${(System.nanoTime() - tCkpt) / 1e9}%5.2f s changed=$changed parts=${next.rdd.getNumPartitions}")
    }
  }

  /** Attribution of the hot-path dequeue scan: same 400k-URL store as
    * Bench.hotPath, then the scan cost cut into (a) the raw banded
    * parquet read at several file-split settings (the leaf files are
    * ~60 KB each, so split packing drives read parallelism), (b) the
    * window-rank + cache + collect pipeline on top of it. */
  private def dequeueProbe(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.spark.{SparkFrontier, ScoreStrategy}
    val root = java.nio.file.Files.createTempDirectory("graft-dqx").toString
    val parts = 32
    val f = new SparkFrontier(spark, root, partitions = parts,
      stateBuckets = parts, strategy = ScoreStrategy.BFS, globalOrder = false)
    time("prefill 400k") {
      f.bulkSchedule(spark.range(400000L).select(
        concat(lit("http://host"), $"id" % 600, lit(".example/p/"), $"id").as("url"),
        (($"id" % 100).cast("double") / 100.0).as("score"),
        ($"id" % 4).cast("int").as("depth")))
    }
    val q = f.queue
    def rawRead(tag: String): Unit =
      for (r <- 1 to 2)
        time(s"raw read noop [$tag] r$r")(noop(q.read(spark)))
    rawRead("default openCost=4M")
    spark.conf.set("spark.sql.files.openCostInBytes", 32L * 1024 * 1024)
    rawRead("openCost=32M")
    spark.conf.set("spark.sql.files.openCostInBytes", 128L * 1024 * 1024)
    rawRead("openCost=128M")
    spark.conf.unset("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.minPartitionNum",
      spark.sparkContext.defaultParallelism)
    rawRead(s"minPartitionNum=${spark.sparkContext.defaultParallelism}")
    spark.conf.unset("spark.sql.files.minPartitionNum")
    // stage attribution of the epoch-1 tagged pipeline (replica of
    // nextBatch's plan over the full file set): read → +window rank →
    // +cache+groups-collect, each twice (codegen-warm second sample)
    for (r <- 1 to 2) {
      import org.apache.spark.sql.expressions.Window
      val orderCols = Seq($"score".asc, $"created_at".asc, $"url".asc)
      val scanned = q.read(spark)
        .withColumn("__bl", lit(false))
        .withColumn("__vis", !$"__bl" && $"crawl_at" <= lit(1L))
      val w = Window.partitionBy($"partition_id", $"__vis").orderBy(orderCols: _*)
      val tagged = scanned
        .withColumn("__rank",
          when($"__vis", row_number().over(w)).otherwise(lit(Int.MaxValue)))
        .withColumn("__sel", $"__vis" && $"__rank" <= 262144 / parts)
      time(s"stage r$r window-rank noop (no cache)")(noop(tagged))
      val cached = tagged.cache()
      time(s"stage r$r cache + groups collect") {
        cached.filter($"__sel")
          .select($"partition_id", floor($"score" * 100).as("band"))
          .groupBy($"partition_id", $"band").count().collect()
      }
      time(s"stage r$r batch-from-cache count") {
        cached.filter($"__sel").count()
      }
      cached.unpersist()
    }
    // the full nextBatch (scan+rank+select+async-commit join) twice:
    // epoch-1 shape (65% of the queue), epoch-2 shape (the rest)
    var e = 0L
    var continue = true
    while (continue) {
      e += 1
      val batch = time(s"nextBatch epoch$e (scan+rank+select)") {
        f.nextBatch(262144 / parts, atEpoch = e)
      }
      val n = time(s"epoch$e count (cached)")(batch.count())
      println(s"  epoch$e rows=$n scan=${f.lastScan.scannedPaths}/${f.lastScan.totalPaths} scanSec=${f.lastScan.scanSec}")
      batch.unpersist()
      continue = n > 0
    }
  }

  /** A timed replica of Bench.hotPath's drain (async commit + fetch
    * verify), warmup included — measures the dequeue/verify overlap
    * without a 15-minute full bench. */
  private def drainProbe(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.spark.{SparkFrontier, ScoreStrategy}
    if (sys.env.contains("GRAFT_DRAIN_LISTCONF"))
      spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", 10000)
    if (sys.env.contains("GRAFT_DRAIN_OPENCOST"))
      spark.conf.set("spark.sql.files.openCostInBytes", 64L * 1024 * 1024)
    val parts = 32
    for (round <- 1 to 2) {
      val root = java.nio.file.Files.createTempDirectory("graft-drain").toString
      val f = new SparkFrontier(spark, root, partitions = parts,
        stateBuckets = parts, strategy = ScoreStrategy.BFS,
        globalOrder = false, asyncDequeueCommit = true)
      f.bulkSchedule(spark.range(400000L).select(
        concat(lit("http://host"), $"id" % 600, lit(".example/p/"), $"id").as("url"),
        (($"id" % 100).cast("double") / 100.0).as("score"),
        ($"id" % 4).cast("int").as("depth")))
      time(s"r$round timed drain (dequeue+verify)") {
        var crawled = 0L
        var continue = true
        var e = 0L
        while (continue) {
          e += 1
          val tq0 = System.nanoTime()
          val batch = f.nextBatch(262144 / parts, atEpoch = e)
          val tq1 = System.nanoTime()
          val (cnt, fails) = batch
            .repartition(spark.sparkContext.defaultParallelism)
            .select($"url", $"depth").as[(String, Int)]
            .map { case (url, depth) =>
              val row = graft.images.ImageSynth.rowFor(url, depth, 64, 64)
              (1L, if (graft.images.ImageSynth.verifyRow(url, depth, row)) 0L else 1L)
            }.toDF("c", "f")
            .agg(coalesce(sum($"c"), lit(0L)), coalesce(sum($"f"), lit(0L)))
            .as[(Long, Long)].first()
          val tq2 = System.nanoTime()
          batch.unpersist()
          require(fails == 0L)
          crawled += cnt
          continue = cnt > 0
          println(f"    epoch$e nextBatchSync=${(tq1 - tq0) / 1e9}%5.2f s verifyJob=${(tq2 - tq1) / 1e9}%5.2f s ($cnt urls)")
        }
        println(s"  drained $crawled urls in ${e} epochs")
      }
    }
  }

  /** Micro-profile of the fetch+verify kernel's parts (single thread,
    * 10k urls warm): pixel synth, png/jpeg encode, decode, psnr,
    * caption+hashing — attributes the per-URL budget. */
  private def kernelParts(): Unit = {
    import graft.images.ImageSynth
    val n = 10000
    val urls = (0 until n).map(i => s"http://host${i % 600}.example/p/$i")
    def bench(tag: String)(f: String => Unit): Unit = {
      urls.take(1000).foreach(f) // warm
      val t0 = System.nanoTime()
      urls.foreach(f)
      println(f"[kp] $tag%-28s ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/url")
    }
    bench("pixels 64x64")(u => ImageSynth.pixels(u, 64, 64))
    val px = ImageSynth.pixels(urls.head, 64, 64)
    bench("encodePng")(_ => ImageSynth.encodePng(px, 64, 64))
    bench("encodeJpeg")(_ => ImageSynth.encodeJpeg(px, 64, 64))
    val png = ImageSynth.encodePng(px, 64, 64)
    val jpg = ImageSynth.encodeJpeg(px, 64, 64)
    println(s"[kp] png bytes=${png.length} jpeg bytes=${jpg.length}")
    bench("decode png")(_ => ImageSynth.decode(png))
    bench("decode jpeg")(_ => ImageSynth.decode(jpg))
    val img = ImageSynth.decode(jpg)
    bench("psnr")(_ => ImageSynth.psnr(px, img))
    bench("phash")(_ => ImageSynth.phash(px, 64, 64))
    bench("caption")(u => ImageSynth.caption(u, 1))
    bench("rowFor FULL")(u => ImageSynth.rowFor(u, 1))
    val rows = urls.map(u => u -> ImageSynth.rowFor(u, 1)).toMap
    bench("verifyRow FULL")(u => require(ImageSynth.verifyRow(u, 1, rows(u))))
  }

  /** PNG writer compressionQuality → deflate-level mapping: speed, size,
    * losslessness at each quality (PNG stays lossless at every level —
    * only the deflate effort changes). */
  private def pngQuality(): Unit = {
    import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
    import java.awt.image.BufferedImage
    ImageIO.setUseCache(false)
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    val px = graft.images.ImageSynth.pixels("http://host1.example/p/1", 64, 64)
    img.setRGB(0, 0, 64, 64, px, 0, 64)
    for (q <- Seq(0.0f, 0.3f, 0.5f, 0.7f, 0.9f, 1.0f)) {
      val w = ImageIO.getImageWritersByFormatName("png").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      def once(): java.io.ByteArrayOutputStream = {
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        w.setOutput(ios)
        w.write(null, new IIOImage(img, null, null), p)
        ios.close()
        bos
      }
      for (_ <- 1 to 300) once()
      val t0 = System.nanoTime()
      for (_ <- 1 to 1000) once()
      val us = (System.nanoTime() - t0) / 1e3 / 1000
      val bos = once()
      val back = ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
      val same = (0 until 64 * 64).forall(i =>
        (back.getRGB(i % 64, i / 64) & 0xffffff) == (px(i) & 0xffffff))
      println(f"[pngq] q=$q%.1f  $us%8.2f us  bytes=${bos.size}%6d  lossless=$same")
      w.dispose()
    }
  }

  /** Plain-threads image-kernel scaling at the GRADED 4→16 levels
    * (Bench's cpuCeiling measures a pure sin loop; this measures the
    * actual codec kernel at the same levels). */
  private def kernelScaling(): Unit = {
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
    run(4, 2000) // warmup
    for (r <- 1 to 3) {
      val r16 = run(16, 4000)
      val r4 = run(4, 4000)
      println(f"[kscale] r$r urls/s @4=$r4%.0f @16=$r16%.0f eff4to16=${r16 / r4 / 4}%.3f")
    }
  }

  /** Dump the hot-path dequeue's physical plan (the `batch` frame of
    * nextBatch) plus a replica of the r5 union-based tagging over the
    * same store — the committed before/after evidence for the round-6
    * single-pass rewrite (the dequeue is an engine path, not a declared
    * query, so BenchProbe's suite-plan dumper cannot reach it). */
  private def dequeuePlans(spark: SparkSession, outDir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.spark.{SparkFrontier, ScoreStrategy}
    val root = java.nio.file.Files.createTempDirectory("graft-dqplan").toString
    val parts = 32
    val f = new SparkFrontier(spark, root, partitions = parts,
      stateBuckets = parts, strategy = ScoreStrategy.BFS, globalOrder = false)
    f.bulkSchedule(spark.range(400000L).select(
      concat(lit("http://host"), $"id" % 600, lit(".example/p/"), $"id").as("url"),
      (($"id" % 100).cast("double") / 100.0).as("score"),
      ($"id" % 4).cast("int").as("depth")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, name),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"[plan] wrote $outDir/$name")
    }
    // AFTER: the real engine path
    dump("hotpath_dequeue_after.txt", f.nextBatch(262144 / parts, atEpoch = 1))
    // BEFORE: the r5 shape — filter-visible → rank → union the rest back
    val orderCols = Seq($"score".asc, $"created_at".asc, $"url".asc)
    val scanned = f.queue.read(spark).withColumn("__bl", lit(false))
    val rankW = Window.partitionBy($"partition_id").orderBy(orderCols: _*)
    val visOnly = scanned.filter(!$"__bl" && $"crawl_at" <= lit(1L))
      .withColumn("__vis", lit(true))
      .withColumn("__rank", row_number().over(rankW))
      .withColumn("__sel", $"__rank" <= 262144 / parts)
    val rest = scanned.filter($"__bl" || $"crawl_at" > lit(1L))
      .withColumn("__vis", lit(false))
      .withColumn("__rank", lit(Int.MaxValue))
      .withColumn("__sel", lit(false))
    dump("hotpath_dequeue_before.txt",
      visOnly.unionByName(rest).filter($"__sel")
        .select(f.queueSchema.fieldNames.map(col): _*))
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("kernel2")) { kernelParts(); return }
    if (args.headOption.contains("dqplans")) {
      val spark = session()
      dequeuePlans(spark, args.lift(1).getOrElse("/root/repo/plans/r06"))
      spark.stop(); return
    }
    if (args.headOption.contains("kscale")) { kernelScaling(); return }
    if (args.headOption.contains("pngq")) { pngQuality(); return }
    val spark = session()
    args.headOption match {
      case Some("minhash") => minhashStages(spark, args(1))
      case Some("clusters") => clusterRounds(spark, args(1))
      case Some("dequeue") => dequeueProbe(spark)
      case Some("drain") => drainProbe(spark)
      case m => sys.error(s"unknown mode $m")
    }
    spark.stop()
  }
}
