package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property layer (SURVEY §5 mirror): invariants that must hold for ANY
  * input, complementing the golden-vector and sequence oracles.
  * Deterministic: generators are driven by fixed seeds (no scalatestplus
  * bridge in the offline cache, so sampling is done directly). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val pathSeg = Gen.alphaNumStr.map(_.take(8))
  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP")
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(10).mkString)
    tld <- Gen.oneOf("com", "org", "co.uk", "net")
    segs <- Gen.listOf(pathSeg).map(_.take(4))
    q <- Gen.option(
      Gen.nonEmptyListOf(Gen.zip(pathSeg, pathSeg)).map(_.take(3)
        .map { case (k, v) => s"$k=$v" }.mkString("&")))
    frag <- Gen.option(pathSeg)
  } yield {
    val base = s"$scheme://$host.$tld/${segs.mkString("/")}"
    base + q.map("?" + _).getOrElse("") + frag.map("#" + _).getOrElse("")
  }

  test("canonicalize is idempotent and drops fragments") {
    for (url <- samples(genUrl, 500)) {
      val c = UrlUtil.canonicalize(url)
      assert(UrlUtil.canonicalize(c) == c, s"$url -> $c")
      assert(!c.contains("#"), s"$url -> $c")
    }
  }

  test("fingerprint is a stable 40-hex sha1 of the canonical form") {
    for (url <- samples(genUrl, 500)) {
      val fp = Hashing.urlFingerprint(url)
      assert(fp.length == 40 && fp.forall(c => c.isDigit || ('a' to 'f').contains(c)))
      assert(fp == Hashing.urlFingerprint(url)) // deterministic
      assert(fp == Hashing.sha1Hex(UrlUtil.canonicalize(url)))
    }
  }

  test("crc32 partition is stable, in range, and matches the signed-crc32 python-mod") {
    val g = Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.choose(1, 64))
    for ((host, n) <- samples(g, 500)) {
      val p = Hashing.crc32Partition(host, n)
      assert(p >= 0 && p < n)
      val crc = Hashing.signedCrc32(host)
      assert(p == ((crc % n) + n) % n) // python %: sign of the divisor
    }
  }

  test("heapq popN drains in non-decreasing score order and loses nothing") {
    val g = Gen.listOf(Gen.choose(0.0, 1.0)).map(_.take(200))
    for (scores <- samples(g, 200)) {
      val heap = new PyHeapq[Double]((a, b) => a < b)
      scores.foreach(heap.push)
      val out = heap.popN(0) // 0 = drain all
      assert(out.size == scores.size)
      assert(out == out.sorted, s"not sorted: $out")
      assert(out.sorted == scores.sorted)
    }
  }

  test("band-prefix top-k equals full-sort top-k whenever the prefix covers k rows") {
    // the pure invariant behind the Spark banded dequeue: bands partition
    // the score axis, so any whole-band prefix holding >= k rows contains
    // exactly the global top-k
    val g = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0L, 1000000L)))
        .map(_.take(300)),
      Gen.choose(1, 50))
    for ((rows, k) <- samples(g, 300)) {
      val byBand = rows.groupBy { case (s, _) => math.min((s * 100).toInt, 99) }
      val bandsAsc = byBand.toList.sortBy(_._1)
      var acc = List.empty[(Double, Long)]
      val it = bandsAsc.iterator
      while (acc.size < k && it.hasNext) acc = acc ++ it.next()._2
      val fromPrefix = acc.sorted.take(k)
      val fromFull = rows.sorted.take(k)
      assert(fromPrefix == fromFull, s"k=$k rows=${rows.size}")
    }
  }

  test("sld is a suffix of the host, idempotent, nonempty") {
    // NB: no fixed label-count bound — under the full public suffix
    // list a registrable domain can have 4+ labels (e.g. a host under
    // pvt.k12.ma.us); the invariants are suffix-ness and idempotence
    val g = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString))
      .map(_.take(5).mkString("."))
    for (host <- samples(g, 500)) {
      val d = UrlUtil.sld(host)
      assert(host == d || host.endsWith("." + d), s"$host -> $d")
      assert(UrlUtil.sld(d) == d)
      assert(d.nonEmpty)
    }
  }
}
