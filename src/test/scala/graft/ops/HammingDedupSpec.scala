package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.spark.SparkTestBase

/** Banded-Hamming near-dup (`PipelineOps.hammingNearDup`) and duplicate
  * clusters (`PipelineOps.dedupClusters`) — the phash/simhash dedup
  * completion. The banded join must find EXACTLY the pairs within the
  * Hamming threshold (pigeonhole guarantees recall when
  * maxHamming < bands; the exact popcount verify guarantees precision),
  * verified against a brute-force all-pairs oracle on planted bit-flip
  * near-dups and on real 64-bit `ImageSynth.phash` values. */
class HammingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, Long)], maxH: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, ha) <- rows
      (ib, hb) <- rows
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= maxH
    } yield (ia, ib, d.toLong)).toSet

  test("64-bit planted near-dups: banded join == brute force (incl. negative hashes)") {
    val rnd = new scala.util.Random(1234)
    val bases = Seq.fill(12)(rnd.nextLong()) // MSB-set values exercise shiftrightunsigned
    // plant near-dups: flip 1..3 bits of each base; plus unrelated noise
    val planted = bases.zipWithIndex.flatMap { case (h, i) =>
      val flips = 1 + i % 3
      var v = h
      (0 until flips).foreach(f => v = v ^ (1L << ((i * 7 + f * 13) % 64)))
      Seq(h, v)
    }
    val noise = Seq.fill(30)(rnd.nextLong())
    val rows = (planted ++ noise).distinct.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val got = PipelineOps
      .hammingNearDup(rows.toDF("id", "h"), "id", "h",
        bits = 64, bands = 4, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteForce(rows, 3))
    assert(got.size >= 12, s"the planted near-dups must be found: ${got.size}")
  }

  test("real ImageSynth 64-bit phashes: banded join == brute force") {
    val rows = (0 until 40).map { i =>
      val r = graft.images.ImageSynth.rowFor(s"http://h$i.com/p/$i", i % 4, 64, 64)
      (i.toLong, r.phash)
    }
    val got = PipelineOps
      .hammingNearDup(rows.toDF("id", "h"), "id", "h",
        bits = 64, bands = 4, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteForce(rows, 3))
  }

  test("pigeonhole precondition is enforced") {
    val df = Seq((1L, 2L)).toDF("id", "h")
    intercept[IllegalArgumentException] {
      PipelineOps.hammingNearDup(df, "id", "h", 64, 4, 4)
    }
    intercept[IllegalArgumentException] {
      PipelineOps.hammingNearDup(df, "id", "h", 64, 5, 2)
    }
  }

  test("dedupClusters: min-label components on a long chain + separate component") {
    // chain 0-1-2-...-9 (diameter 9 forces pointer jumping past naive
    // one-hop propagation budgets), a triangle {100,101,102}, a pair
    val chain = (0L until 9L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pair = Seq((200L, 201L))
    val edges = (chain ++ tri ++ pair).toDF("a", "b")
    val got = PipelineOps.dedupClusters(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    (0L to 9L).foreach(n => assert(got(n) == 0L, s"chain node $n"))
    Seq(100L, 101L, 102L).foreach(n => assert(got(n) == 100L))
    Seq(200L, 201L).foreach(n => assert(got(n) == 200L))
    assert(got.size == 15)
  }
}
