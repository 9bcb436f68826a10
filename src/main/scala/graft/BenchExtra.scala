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
          val batch = f.nextBatch(262144 / parts, atEpoch = e)
          val (cnt, fails) = batch
            .repartition(spark.sparkContext.defaultParallelism)
            .select($"url", $"depth").as[(String, Int)]
            .map { case (url, depth) =>
              val row = graft.images.ImageSynth.rowFor(url, depth, 64, 64)
              (1L, if (graft.images.ImageSynth.verifyRow(url, depth, row)) 0L else 1L)
            }.toDF("c", "f")
            .agg(coalesce(sum($"c"), lit(0L)), coalesce(sum($"f"), lit(0L)))
            .as[(Long, Long)].first()
          batch.unpersist()
          require(fails == 0L)
          crawled += cnt
          continue = cnt > 0
        }
        println(s"  drained $crawled urls in ${e} epochs")
      }
    }
  }

  def main(args: Array[String]): Unit = {
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
