package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.local.{Graphs, LocalFrontier, FrontierTester, DFSStrategy, QueueOrdering}
import java.nio.file.Files

/** The Bloom prefilter must be invisible to correctness: crawl order and
  * URL-seen set identical with and without it; sidecars survive restart. */
class BloomSeenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bloom sidecar roundtrip (murmur128 seen-keys), version stamps") {
    import spark.implicits._
    import graft.core.Hashing.seenKey
    val root = Files.createTempDirectory("bloom-rt").toString
    val bs = new BloomSeen(root)
    val df = Seq((0, "fp-a"), (0, "fp-b"), (1, "fp-c"))
      .toDF("sbucket", "fingerprint")
    bs.rebuild(df, Set(0, 1), version = 7)
    val b0 = bs.load(0).get
    assert(b0.mightContainLong(seenKey("fp-a")) && b0.mightContainLong(seenKey("fp-b")))
    assert(bs.load(1).get.mightContainLong(seenKey("fp-c")))
    assert(bs.load(2).isEmpty)
    assert(bs.version(0).contains(7L) && bs.version(2).isEmpty)
    // definite negatives: none of 1000 random keys should all hit
    val hits = (0 until 1000).count(i => b0.mightContainLong(seenKey(s"nope-$i")))
    assert(hits <= 30, s"fpp too high: $hits/1000")
  }

  test("incremental mergeUpdates keeps old keys and adds new ones, bumps version") {
    import spark.implicits._
    import graft.core.Hashing.seenKey
    val root = Files.createTempDirectory("bloom-inc").toString
    val bs = new BloomSeen(root)
    bs.rebuild(Seq((0, "old-1"), (0, "old-2")).toDF("sbucket", "fingerprint"),
      Set(0), version = 3)
    bs.mergeUpdates(Seq((0, "new-1")).toDF("sbucket", "fingerprint"),
      Set(0), version = 4)
    val b0 = bs.load(0).get
    assert(b0.mightContainLong(seenKey("old-1")), "merge must keep the base keys")
    assert(b0.mightContainLong(seenKey("old-2")))
    assert(b0.mightContainLong(seenKey("new-1")), "merge must add the delta keys")
    assert(bs.version(0).contains(4L))
    // first-touch bucket: merge into an empty base
    bs.mergeUpdates(Seq((5, "solo")).toDF("sbucket", "fingerprint"),
      Set(5), version = 4)
    assert(bs.load(5).get.mightContainLong(seenKey("solo")))
  }

  test("stale sidecar never causes a re-crawl: bloom enabled on a bloomless store") {
    // run epochs with useBloom=false (no sidecars), then continue the
    // SAME store with useBloom=true: every bucket's sidecar is absent ⇒
    // stale ⇒ rows route through the exact anti-join; the crawl must not
    // re-schedule seen URLs (ADVICE: 'missing bloom != no seen keys')
    val root = Files.createTempDirectory("bloom-stale").toString
    val f1 = new SparkFrontier(spark, root, partitions = 4, stateBuckets = 4,
      strategy = ScoreStrategy.DFS, globalOrder = true, useBloom = false)
    f1.addSeeds(Graphs.site03.seeds)
    val c1 = new SparkCrawler(f1, GraphTables.webDF(spark, Graphs.site03), 5)
    c1.crawlOnce(1); c1.crawlOnce(2) // partial crawl, states populated
    val seen1 = f1.stateSnapshot()

    val f2 = new SparkFrontier(spark, root, partitions = 4, stateBuckets = 4,
      strategy = ScoreStrategy.DFS, globalOrder = true, useBloom = true)
    val c2 = new SparkCrawler(f2, GraphTables.webDF(spark, Graphs.site03), 5)
    c2.run(maxEpochs = 100)
    val all = c1.sequence.flatten ++ c2.sequence.flatten
    assert(all.distinct.size == all.size,
      s"re-crawled URLs after enabling bloom on a bloomless store: " +
        all.diff(all.distinct).toString)
    assert(seen1.keySet.subsetOf(f2.stateSnapshot().keySet))
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
