package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.{SparkFrontier, SparkCrawler, ScoreStrategy, GraphTables, SparkTestBase}
import graft.local.Graphs
import java.nio.file.{Files, Paths}

/** Streaming seed ingestion: files land in a directory, a Structured
  * Streaming query schedules them; the stream checkpoint makes ingestion
  * exactly-once across restarts. */
class SeedStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("seed files ingest exactly once across stream restarts, then crawl") {
    val root = Files.createTempDirectory("graft-seedstream").toString
    val seedsDir = Files.createTempDirectory("graft-seeds").toString
    val frontier = new SparkFrontier(spark, root, partitions = 4,
      stateBuckets = 4, strategy = ScoreStrategy.BFS, globalOrder = true)
    val stream = new SeedStream(frontier, seedsDir)

    Files.writeString(Paths.get(seedsDir, "batch1.txt"),
      "http://aaa.com/1\n# a comment line\n\n")
    stream.ingestAvailable()
    assert(frontier.queueSize() == 1)

    // restart over the same checkpoint: batch1 must NOT re-ingest
    new SeedStream(frontier, seedsDir).ingestAvailable()
    assert(frontier.queueSize() == 1)

    // a new file arrives; only it is picked up
    Files.writeString(Paths.get(seedsDir, "batch2.txt"), "http://bbb.com/1\n")
    new SeedStream(frontier, seedsDir).ingestAvailable()
    assert(frontier.queueSize() == 2)

    // the streamed seeds drive a normal crawl to completion
    val crawler = new SparkCrawler(frontier,
      GraphTables.webDF(spark, Graphs.site02), 100)
    val seq = crawler.run()
    assert(seq.toSet == Graphs.site02.nodes)
  }
}
