package graft.bus

import org.apache.spark.sql.SparkSession
import graft.local.Graphs
import graft.spark.{ScoreStrategy, SparkFrontier}

/** Throwaway debug driver for the bus topology (not part of the API). */
object BusDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val graph = Graphs.benchGraph(hosts = 4, depth = 3, fanout = 3)
    println(s"graph nodes=${graph.nodes.size} seeds=${graph.seeds}")
    val web: Map[String, Seq[String]] =
      graph.pages.map { case (u, ls) => u -> (ls: Seq[String]) }.toMap
    val busDir = java.nio.file.Files.createTempDirectory("busdbg").toString
    val storeDir = java.nio.file.Files.createTempDirectory("busdbg-store").toString
    println(s"bus=$busDir store=$storeDir")
    val bus = new LogBus(busDir, spiderLogPartitions = 2,
      spiderFeedPartitions = 2, maxNextRequests = 64)
    val frontier = new SparkFrontier(spark, storeDir,
      partitions = 2, stateBuckets = 2, strategy = ScoreStrategy.BFS,
      globalOrder = true, useBloom = false)
    frontier.addSeeds(graph.seeds)
    val spiders = (0 until 2).map(p =>
      new BusSpider(bus, p, web, BusCodec.Msgpack, verifyPayload = false))
    val threads = spiders.map(s => new Thread(s, s"spider-${s.partitionId}"))
    threads.foreach(_.start())
    val worker = new SparkBusWorker(frontier, bus, BusCodec.Msgpack, 16)
    def slCommit(p: Int): String = {
      val f = java.nio.file.Paths.get(busDir, "spider-log", s"p$p", "commit")
      val c = graft.bus.LogBus.readCommit(f)
      val d = graft.bus.LogBus.readCommit(
        java.nio.file.Paths.get(busDir, "spider-log", s"p$p", "consumed-db"))
      s"p$p=${c._1}/${d._1}"
    }
    val mon = new Thread(() => {
      while (true) {
        Thread.sleep(3000)
        println(s"[mon] epochs=${worker.epochsRun} sched=${worker.urlsScheduledToFeed} " +
          s"proc=${worker.urlsProcessed} fetched=${spiders.map(_.fetched).sum} " +
          s"lag=${(0 until 2).map(bus.spiderFeed.lag)} " +
          s"alive=${threads.map(_.isAlive)} err=${spiders.map(s => Option(s.error).map(_.toString).orNull)} " +
          s"sl=${slCommit(0)},${slCommit(1)}")
      }
    })
    mon.setDaemon(true)
    mon.start()
    worker.run()
    println(s"[done] epochs=${worker.epochsRun} sched=${worker.urlsScheduledToFeed} " +
      s"proc=${worker.urlsProcessed} fetched=${spiders.map(_.fetched).sum}")
    spiders.foreach(_.stopping = true)
    threads.foreach(_.join(5000))
    val fetchedSet = spiders.flatMap(s => {
      val it = s.fetchedUrls.iterator(); val b = List.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }).toSet
    println(s"fetched=${fetchedSet.size} expected=${graph.nodes.size}")
    println("missing=" + (graph.nodes -- fetchedSet).toList.sorted.take(30))
    spark.stop()
  }
}
