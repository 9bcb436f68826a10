package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.local.{Graphs, LocalFrontier, FrontierTester, DFSStrategy, QueueOrdering}
import java.nio.file.Files

/** The Bloom prefilter must be invisible to correctness: crawl order and
  * URL-seen set identical with and without it; sidecars survive restart. */
class BloomSeenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bloom sidecar roundtrip") {
    import spark.implicits._
    val root = Files.createTempDirectory("bloom-rt").toString
    val bs = new BloomSeen(root)
    val df = Seq((0, "fp-a"), (0, "fp-b"), (1, "fp-c"))
      .toDF("sbucket", "fingerprint")
    bs.rebuild(df, Set(0, 1), version = 7)
    val b0 = bs.load(0).get
    assert(b0.mightContainString("fp-a") && b0.mightContainString("fp-b"))
    assert(bs.load(1).get.mightContainString("fp-c"))
    assert(bs.load(2).isEmpty)
    // definite negatives: none of 1000 random keys should all hit
    val hits = (0 until 1000).count(i => b0.mightContainString(s"nope-$i"))
    assert(hits <= 30, s"fpp too high: $hits/1000")
  }

  test("bloom-prefiltered crawl == exact crawl == oracle (order + states)") {
    def sparkRun(useBloom: Boolean): (List[String], Map[String, Int]) = {
      val root = Files.createTempDirectory(s"bloom-$useBloom").toString
      val f = new SparkFrontier(spark, root, partitions = 4, stateBuckets = 4,
        strategy = ScoreStrategy.DFS, globalOrder = true, useBloom = useBloom)
      f.addSeeds(Graphs.site03.seeds)
      val c = new SparkCrawler(f, GraphTables.webDF(spark, Graphs.site03), 5)
      (c.run(), f.stateSnapshot())
    }
    val (seqB, statesB) = sparkRun(useBloom = true)
    val (seqE, statesE) = sparkRun(useBloom = false)
    val lf = new LocalFrontier(new DFSStrategy, ordering = QueueOrdering.ScoreCreated)
    val t = new FrontierTester(lf, Graphs.site03, 5)
    t.run()
    assert(seqB == t.urlSequence)
    assert(seqB == seqE)
    assert(statesB == statesE)
    assert(statesB == lf.states.snapshot)
  }
}
