package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** asyncDequeueCommit: the dequeue's residue-rewrite commit overlaps the
  * caller's fetch stage. Every other queue entry point joins the pending
  * commit, so the mode must be OBSERVATIONALLY IDENTICAL to the
  * synchronous default — same per-epoch batches, same final store
  * state — including when writes interleave with the drain. */
class AsyncCommitSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def prefill(f: SparkFrontier, n: Int, hosts: Int = 13,
      path: String = "p"): Unit =
    f.bulkSchedule(spark.range(n).select(
      concat(lit("http://h"), $"id" % hosts, lit(s".example/$path/"), $"id").as("url"),
      (($"id" % 10).cast("double") / 10.0).as("score"),
      lit(0).as("depth")))

  private def mk(async: Boolean): SparkFrontier =
    new SparkFrontier(spark,
      Files.createTempDirectory(s"graft-async$async").toString,
      partitions = 4, stateBuckets = 4, strategy = ScoreStrategy.BFS,
      globalOrder = false, asyncDequeueCommit = async)

  private def drain(f: SparkFrontier, budget: Int): Seq[Set[String]] = {
    val out = Seq.newBuilder[Set[String]]
    var continue = true
    while (continue) {
      val b = f.nextBatch(budget)
      val urls = b.select($"url").as[String].collect().toSet
      b.unpersist()
      if (urls.nonEmpty) out += urls
      continue = urls.nonEmpty
    }
    out.result()
  }

  test("async drain == sync drain (same epoch batches, same final state)") {
    val sync = mk(async = false)
    val async = mk(async = true)
    prefill(sync, 500)
    prefill(async, 500)
    val bs = drain(sync, 40)
    val ba = drain(async, 40)
    assert(ba == bs, "per-epoch batch sets must match the sync mode")
    assert(async.queueSize() == 0L && sync.queueSize() == 0L)
  }

  test("updateScores right behind an in-flight commit: no deadlock, consistent") {
    val f = mk(async = true)
    prefill(f, 300)
    val b = f.nextBatch(20)
    val dequeued = b.count(); b.unpersist()
    // updateScores takes the queue table lock — it must join the pending
    // background commit BEFORE acquiring it (regression: await inside the
    // lock deadlocks against the commit thread needing the same lock)
    val n = f.updateScores(
      Seq(("http://h1.example/p/27", 0.99)).toDF("url", "score"))
    assert(n <= 1)
    assert(f.queueSize() == 300 - dequeued)
  }

  test("append interleaved with an in-flight commit is not lost") {
    val f = mk(async = true)
    prefill(f, 300)
    val b1 = f.nextBatch(30)
    val n1 = b1.count(); b1.unpersist()
    // while (possibly) still committing the residue, append more work —
    // bulkSchedule must join the pending commit, not race it (disjoint
    // URL space: the queue is not a set, identical rows would collide)
    prefill(f, 100, hosts = 7, path = "q")
    val rest = drain(f, 1000)
    assert(n1 + rest.map(_.size).sum == 400L,
      s"no row lost or duplicated across the async boundary: $n1 + ${rest.map(_.size).sum}")
    assert(f.queueSize() == 0L)
  }
}
