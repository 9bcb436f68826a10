package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.local.Graphs
import java.nio.file.Files

/** Salted skew-splitting of hot hosts: the per-host politeness budget is
  * split across salt groups — the host-global cap still holds and no URL
  * is lost, while a flooded host's window work parallelizes. */
class SaltedPolitenessSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("salted host cap: ≤ maxPerHost per host per epoch, nothing lost") {
    // skewed frontier: host0 has ~16× the tree of the others
    val graph = Graphs.benchGraph(hosts = 4, depth = 3, fanout = 3,
      skewHost = 0, skewFactor = 16)
    val root = Files.createTempDirectory("graft-salt").toString
    val frontier = new SparkFrontier(spark, root, partitions = 4,
      stateBuckets = 4, strategy = ScoreStrategy.BFS,
      maxPerHost = 4, hostSalts = 2, globalOrder = false)
    frontier.addSeeds(graph.seeds)
    val crawler = new SparkCrawler(frontier, GraphTables.webDF(spark, graph), 1000)
    val seq = crawler.run(maxEpochs = 200)
    crawler.sequence.foreach { batch =>
      val perHost = batch.groupBy(u => graft.core.UrlUtil.slotKey(u))
        .view.mapValues(_.size)
      perHost.foreach { case (h, n) =>
        assert(n <= 4, s"host $h got $n > maxPerHost in one epoch")
      }
    }
    assert(seq.toSet == graph.nodes, "salting must not lose URLs")
    assert(seq.length == graph.nodes.size)
  }
}
