package graft
import org.apache.spark.sql.SparkSession
import graft.local.Graphs
import graft.spark._
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32").toInt
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val graph = Graphs.benchGraph(60, 4, 8)
    val web = GraphTables.webDF(spark, graph).cache(); web.count()
    val root = java.nio.file.Files.createTempDirectory("probe").toString
    val f = new SparkFrontier(spark, root, partitions = threads,
      stateBuckets = threads, strategy = ScoreStrategy.BFS)
    f.addSeeds(graph.seeds)
    val c = new SparkCrawler(f, web, 4096, collectSequence = false,
      verifyPayloadOnFetch = true)
    var e = f.epoch; var cont = true
    while (cont) {
      val t0 = System.nanoTime()
      cont = c.crawlOnce(e + 1)
      if (cont) e += 1
      println(f"epoch=$e urls=${c.urlsCrawled} sec=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    // count files written
    val n = java.nio.file.Files.walk(java.nio.file.Paths.get(root)).filter(p => p.toString.endsWith(".parquet")).count()
    println(s"parquet files: $n")
    spark.stop()
  }
}
