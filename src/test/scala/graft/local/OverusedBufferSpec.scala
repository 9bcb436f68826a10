package graft.local

import org.scalatest.funsuite.AnyFunSuite

/** Politeness oracles: buffer unit semantics from
  * tests/test_core_overused_buffer.py and the SITE_09 politeness run from
  * tests/test_overused_buffer.py. */
class OverusedBufferSpec extends AnyFunSuite {

  private val urls = List(
    "http://www.example.com", "http://www.example.com/some/",
    "htttp://www.example.com/some/page/", "http://example.com",
    "http://example.com/some/page", "http://example1.com")

  private def mkGetOnce(rs: List[LocalRequest]): Int => List[LocalRequest] = {
    val it = rs.iterator
    n => (0 until n).flatMap(_ => if (it.hasNext) Some(it.next()) else None).toList
  }

  test("base semantics (test_core_overused_buffer.py test_base)") {
    val rs = urls.map(new LocalRequest(_))
    val List(r1, r2, r3, r4, r5, r6) = rs
    val get = mkGetOnce(rs)
    val ob = new OverusedBuffer(maxPerKey = None, keepPerKey = 100,
      maxKeys = None, keepKeys = 100)

    assert(ob.pendingCount == 0)
    assert(ob.getNextRequests(10, Set("www.example.com", "example1.com"), get).toSet
      == Set(r4, r5))
    assert(ob.pendingCount == 4)
    assert(ob.getNextRequests(10, Set("www.example.com"), get) == List(r6))
    assert(ob.pendingCount == 3)
    assert(ob.getNextRequests(10, Set("www.example.com"), get) == Nil)
    assert(ob.pendingCount == 3)
    assert(ob.getNextRequests(3, Set("example.com"), get).toSet == Set(r1, r2, r3))
    assert(ob.pendingCount == 0)
    assert(ob.getNextRequests(10, Set.empty, get) == Nil)
    assert(ob.pendingCount == 0)
  }

  test("per-key purging (test_purging_keys)") {
    val rs = urls.map(new LocalRequest(_))
    val cyc = Iterator.continually(rs).flatten
    val get: Int => List[LocalRequest] = n => (0 until n).map(_ => cyc.next()).toList
    val ob = new OverusedBuffer(maxPerKey = Some(10), keepPerKey = 1,
      maxKeys = Some(100), keepKeys = 10)
    ob.getNextRequests(10, Set("example.com", "www.example.com"), get)
    assert(ob.pendingCount == 9)
    ob.getNextRequests(10, Set("example.com", "www.example.com"), get)
    assert(ob.pendingCount == 7) // www.example.com purged to keep=1
  }

  test("key-set purging (test_purging_keys_set)") {
    val hosts = (0 until 21).map(i => f"host$i%02d").toList
    val rs = hosts.map(h => new LocalRequest(s"http://$h/"))
    val cyc = Iterator.continually(rs).flatten
    val get: Int => List[LocalRequest] = n => (0 until n).map(_ => cyc.next()).toList
    val ob = new OverusedBuffer(maxPerKey = Some(1000), keepPerKey = 100,
      maxKeys = Some(10), keepKeys = 1)
    ob.getNextRequests(10, hosts.toSet, get)
    assert(ob.keyCount == 10)
    ob.getNextRequests(10, hosts.toSet, get)
    assert(ob.keyCount == 20)
    ob.getNextRequests(10, hosts.toSet, get)
    assert(ob.keyCount < 20)
  }

  test("SITE_09 politeness run: invariants (test_overused_buffer.py)") {
    val frontier = new LocalFrontier(new DFSStrategy, partitions = 1,
      ordering = QueueOrdering.ScoreCreated,
      politeness = Some(new OverusedBuffer()))
    val dl = new DownloaderSimulator(rate = 1)
    val tester = new FrontierTester(frontier, Graphs.site09, maxNextRequests = 5, dl)
    tester.run()
    val allDomains = scala.collection.mutable.Set.empty[String]
    for ((requests, _, overused) <- tester.sequence) {
      val over = overused.toSet
      for (r <- requests) {
        allDomains += r.hostname
        assert(!over.contains(r.hostname),
          s"request ${r.url} returned while host overused")
      }
      assert(over.subsetOf(allDomains.toSet))
    }
    // every reachable page crawled exactly once
    assert(tester.urlSequence.toSet == Graphs.site09.nodes)
    assert(tester.urlSequence.length == Graphs.site09.nodes.size)
  }

  test("SITE_09 politeness run: deterministic sequence fixture") {
    val frontier = new LocalFrontier(new DFSStrategy, partitions = 1,
      ordering = QueueOrdering.ScoreCreated,
      politeness = Some(new OverusedBuffer()))
    val dl = new DownloaderSimulator(rate = 1)
    val tester = new FrontierTester(frontier, Graphs.site09, maxNextRequests = 5, dl)
    tester.run()
    // Exact match of the published politeness oracle
    // (tests/test_overused_buffer.py:10-17 SEQUENCE_01_A) under
    // rate=1, mnr=5, plus the 7-loop-pass count the shipped test pins.
    assert(tester.urlSequence == List(
      "https://www.a.com", "http://b.com", "http://www.a.com/2",
      "http://www.a.com/2/1", "http://www.a.com/3", "http://www.a.com/2/1/3",
      "http://www.a.com/2/4/1", "http://www.a.net", "http://b.com/2",
      "http://test.cloud.c.com", "http://cloud.c.com",
      "http://test.cloud.c.com/2", "http://b.com/entries?page=2",
      "http://www.a.com/2/4/2"))
    assert(tester.sequence.length == 7)
  }
}
