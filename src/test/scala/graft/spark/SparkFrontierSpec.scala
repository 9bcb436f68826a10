package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.local.{Graphs, CrawlGraph, LocalFrontier, FrontierTester, BFSStrategy, DFSStrategy, QueueOrdering}
import java.nio.file.Files

/** The Spark engine must reproduce the reference crawl ordering and
  * URL-seen set (north rule) — checked against the same published oracles
  * the local conformance engine pins, plus checkpoint-resume. */
class SparkFrontierSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def webDF(graph: CrawlGraph) = {
    import spark.implicits._
    graph.pages.map { case (u, ls) => (u, ls) }.toDF("url", "outlinks")
  }

  private def localRun(graph: CrawlGraph, strategy: graft.local.CrawlStrategy,
      mnr: Int): (List[String], Map[String, Int]) = {
    val f = new LocalFrontier(strategy, ordering = QueueOrdering.ScoreCreated)
    val t = new FrontierTester(f, graph, mnr)
    t.run()
    (t.urlSequence, f.states.snapshot)
  }

  private def sparkRun(graph: CrawlGraph, strategy: ScoreStrategy, mnr: Int,
      tag: String): (List[String], Map[String, Int]) = {
    val root = Files.createTempDirectory(s"graft-$tag").toString
    val frontier = new SparkFrontier(spark, root, partitions = 4,
      stateBuckets = 4, strategy = strategy, globalOrder = true)
    frontier.addSeeds(graph.seeds)
    val crawler = new SparkCrawler(frontier, webDF(graph), mnr)
    val seq = crawler.run()
    (seq, frontier.stateSnapshot())
  }

  private def fp(url: String): String = graft.core.Hashing.urlFingerprint(url)

  test("BFS SITE_01 mnr=1: crawl order + URL-seen set match the oracle") {
    val (localSeq, localStates) = localRun(Graphs.site01, new BFSStrategy, 1)
    val (sparkSeq, sparkStates) = sparkRun(Graphs.site01, ScoreStrategy.BFS, 1, "b1")
    assert(sparkSeq == localSeq)
    assert(sparkStates == localStates)
  }

  test("BFS SITE_02 mnr=100: crawl order matches the oracle") {
    val (localSeq, _) = localRun(Graphs.site02, new BFSStrategy, 100)
    val (sparkSeq, _) = sparkRun(Graphs.site02, ScoreStrategy.BFS, 100, "b100")
    assert(sparkSeq == localSeq)
  }

  test("DFS SITE_03 mnr=5: crawl order + URL-seen set match the oracle") {
    val (localSeq, localStates) = localRun(Graphs.site03, new DFSStrategy, 5)
    val (sparkSeq, sparkStates) = sparkRun(Graphs.site03, ScoreStrategy.DFS, 5, "d5")
    assert(sparkSeq == localSeq)
    assert(sparkStates == localStates)
  }

  test("DFS SITE_02 mnr=2: crawl order matches the oracle") {
    val (localSeq, _) = localRun(Graphs.site02, new DFSStrategy, 2)
    val (sparkSeq, _) = sparkRun(Graphs.site02, ScoreStrategy.DFS, 2, "d2")
    assert(sparkSeq == localSeq)
  }

  private def localRunOrdered(graph: CrawlGraph, strategy: graft.local.CrawlStrategy,
      ordering: QueueOrdering, mnr: Int): List[String] = {
    val f = new LocalFrontier(strategy, ordering = ordering)
    val t = new FrontierTester(f, graph, mnr)
    t.run()
    t.urlSequence
  }

  private def sparkRunOrdered(graph: CrawlGraph, strategy: ScoreStrategy,
      ordering: QueueOrdering, mnr: Int, tag: String): List[String] = {
    val root = Files.createTempDirectory(s"graft-$tag").toString
    val frontier = new SparkFrontier(spark, root, partitions = 4,
      stateBuckets = 4, strategy = strategy, globalOrder = true,
      ordering = ordering)
    frontier.addSeeds(graph.seeds)
    new SparkCrawler(frontier, webDF(graph), mnr).run()
  }

  test("FIFO ordering (created ASC) SITE_02 matches the oracle at mnr=1 and 5") {
    for (mnr <- Seq(1, 5)) {
      val local = localRunOrdered(Graphs.site02,
        new graft.local.BasicStrategy, QueueOrdering.Fifo, mnr)
      val spk = sparkRunOrdered(Graphs.site02, ScoreStrategy.Basic,
        QueueOrdering.Fifo, mnr, s"fifo$mnr")
      assert(spk == local, s"mnr=$mnr")
    }
  }

  test("LIFO ordering (created DESC) SITE_01 matches the oracle at mnr=1 and 2") {
    for (mnr <- Seq(1, 2)) {
      val local = localRunOrdered(Graphs.site01,
        new graft.local.BasicStrategy, QueueOrdering.Lifo, mnr)
      val spk = sparkRunOrdered(Graphs.site01, ScoreStrategy.Basic,
        QueueOrdering.Lifo, mnr, s"lifo$mnr")
      assert(spk == local, s"mnr=$mnr")
    }
  }

  test("shipped BFS/DFS scores (strategy/depth.py:35-42) match the oracle") {
    val lb = localRunOrdered(Graphs.site02,
      new graft.local.ShippedBFSStrategy, QueueOrdering.ScoreCreated, 5)
    val sb = sparkRunOrdered(Graphs.site02, ScoreStrategy.ShippedBFS,
      QueueOrdering.ScoreCreated, 5, "shipb")
    assert(sb == lb)
    val ld = localRunOrdered(Graphs.site01,
      new graft.local.ShippedDFSStrategy, QueueOrdering.ScoreCreated, 2)
    val sd = sparkRunOrdered(Graphs.site01, ScoreStrategy.ShippedDFS,
      QueueOrdering.ScoreCreated, 2, "shipd")
    assert(sd == ld)
  }

  test("checkpoint-resume: killing the driver mid-crawl loses nothing") {
    val root = Files.createTempDirectory("graft-resume").toString
    val graph = Graphs.site03
    val f1 = new SparkFrontier(spark, root, partitions = 4, stateBuckets = 4,
      strategy = ScoreStrategy.BFS, globalOrder = true)
    f1.addSeeds(graph.seeds)
    val c1 = new SparkCrawler(f1, webDF(graph), 5)
    var e = f1.epoch
    (1 to 3).foreach { _ => if (c1.crawlOnce(e + 1)) e += 1 }
    val partial = c1.sequence.toList.flatten

    // brand-new objects over the same root — resume from the manifests
    val f2 = new SparkFrontier(spark, root, partitions = 4, stateBuckets = 4,
      strategy = ScoreStrategy.BFS, globalOrder = true)
    assert(f2.epoch == e)
    val c2 = new SparkCrawler(f2, webDF(graph), 5)
    val rest = c2.run()
    val full = partial ++ rest

    val (localSeq, localStates) = localRun(graph, new BFSStrategy, 5)
    assert(full == localSeq)
    assert(f2.stateSnapshot() == localStates)
  }

  test("politeness cap: no more than maxPerHost per host per epoch; " +
       "withheld URLs are deferred, not dropped") {
    val root = Files.createTempDirectory("graft-polite").toString
    val graph = Graphs.site09
    val frontier = new SparkFrontier(spark, root, partitions = 4,
      stateBuckets = 4, strategy = ScoreStrategy.DFS, maxPerHost = 1,
      globalOrder = true)
    frontier.addSeeds(graph.seeds)
    val crawler = new SparkCrawler(frontier, webDF(graph), 5)
    val seq = crawler.run()
    // every epoch: ≤1 request per host
    crawler.sequence.foreach { batch =>
      val hosts = batch.map(u => graft.core.UrlUtil.slotKey(u))
      assert(hosts.distinct.size == hosts.size,
        s"host repeated within an epoch: $batch")
    }
    // nothing lost: all reachable pages crawled exactly once
    assert(seq.toSet == graph.nodes)
    assert(seq.length == graph.nodes.size)
  }
}
