package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.spark.SparkTestBase
import FetchGate.{GateEvent, Granted}
import scala.jdk.CollectionConverters._

/** Streaming token-bucket politeness (FetchGate): per-slot budgets hold
  * across micro-batches, backlog drains FIFO as tokens refill — even
  * after the slot's producer goes quiet (processing-time timeouts stand
  * in for the reference buffer's drain-on-every-poll) — and independent
  * slots never share a budget (OverusedBuffer semantics,
  * contrib/scrapy/overusedbuffer.py, at micro-batch granularity).
  *
  * NOTE: no `processAllAvailable()` here — the gate's timeout re-arming
  * keeps scheduling drain batches, so quiescence never latches; the
  * test polls the cumulative grant set instead. */
class FetchGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("per-slot token bucket: cap per batch, FIFO drain incl. idle slots, isolation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GateEvent]
    val gated = FetchGate(input.toDS(), capacity = 2.0, refillPerBatch = 2.0,
      drainIntervalMs = 50)
    val grants = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    val q = gated.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Granted], id: Long) =>
        b.collect().foreach(g => grants.add((g.slot, g.seq, id)))
        ()
      }
      .start()
    def snapshot(): List[(String, Long, Long)] = grants.asScala.toList
    def awaitSeqs(expect: Set[(String, Long)], tag: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (snapshot().map(t => (t._1, t._2)).toSet != expect &&
          System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(snapshot().map(t => (t._1, t._2)).toSet == expect, tag)
    }
    try {
      // a.com floods 5 requests, b.com sends 1. Capacity 2 per slot, so
      // a.com's flood takes 3 refill rounds; the deferred requests drain
      // WITHOUT any further a.com input (timeout-driven batches).
      input.addData(
        GateEvent("a.com", "http://a.com/1", 1), GateEvent("a.com", "http://a.com/2", 2),
        GateEvent("a.com", "http://a.com/3", 3), GateEvent("a.com", "http://a.com/4", 4),
        GateEvent("a.com", "http://a.com/5", 5), GateEvent("b.com", "http://b.com/1", 6))
      awaitSeqs((1L to 6L).map {
        case 6 => ("b.com", 6L); case i => ("a.com", i) }.toSet,
        "all requests eventually granted (idle backlog drains via timeouts)")

      val g = snapshot()
      // exactly-once: no duplicate grants across batches
      assert(g.map(t => (t._1, t._2)).distinct.size == g.size, s"dupes: $g")
      // token cap: no (slot, batch) granted more than `capacity`
      g.groupBy(t => (t._1, t._3)).foreach { case (k, rows) =>
        assert(rows.size <= 2, s"slot/batch $k granted ${rows.size} > capacity")
      }
      // FIFO per slot: a.com's seqs granted in arrival order across batches
      val aSeqs = g.filter(_._1 == "a.com").sortBy(_._3).map(_._2)
      assert(aSeqs == aSeqs.sorted, s"FIFO violated: $aSeqs")
      // isolation: b.com's single request was NOT queued behind a.com's
      // flood — it passed in b's first active batch (= a's first batch)
      val bBatch = g.filter(_._1 == "b.com").map(_._3).min
      val aFirst = g.filter(_._1 == "a.com").map(_._3).min
      assert(bBatch == aFirst, s"b.com deferred by a.com's flood: $g")
      // the flood spread over >= 3 distinct batches (2 tokens per refill)
      assert(g.filter(_._1 == "a.com").map(_._3).distinct.size >= 3)

      // a late arrival after the backlog cleared passes promptly
      input.addData(GateEvent("a.com", "http://a.com/6", 7))
      awaitSeqs((1L to 7L).map {
        case 6 => ("b.com", 6L); case i => ("a.com", i) }.toSet, "late arrival")
    } finally q.stop()
  }

  test("maxPending caps only what must WAIT — available tokens always grant") {
    // regression: a burst larger than maxPending but within the token
    // budget must pass entirely in its batch; only the deferred
    // remainder is subject to the pending cap (newest-dropped)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GateEvent]
    val gated = FetchGate(input.toDS(), capacity = 5.0, refillPerBatch = 5.0,
      maxPending = 2, drainIntervalMs = 50)
    val grants = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = gated.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Granted], _: Long) =>
        b.collect().foreach(g => grants.add(g.seq))
        ()
      }
      .start()
    def await(expect: Set[Long], tag: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (grants.asScala.toSet != expect && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(grants.asScala.toSet == expect, tag)
    }
    try {
      // 4 > maxPending arrivals, 5 tokens: ALL granted, nothing dropped
      input.addData((1L to 4L).map(i => GateEvent("c.com", s"http://c.com/$i", i)): _*)
      await((1L to 4L).toSet, "burst within the token budget passes whole")
      // 9 arrivals, 5 tokens: 5 grant now, deferred 6..9 capped to {6,7}
      // (newest dropped); those two drain on refill — 8,9 never granted
      input.addData((11L to 19L).map(i => GateEvent("c.com", s"http://c.com/$i", i)): _*)
      await((1L to 4L).toSet ++ (11L to 17L).toSet,
        "overflow drops only the newest beyond tokens+maxPending")
      Thread.sleep(500) // further drain batches must not resurrect 18,19
      assert(grants.asScala.toSet == (1L to 4L).toSet ++ (11L to 17L).toSet)
    } finally q.stop()
  }
}
