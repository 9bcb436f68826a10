package graft.local

import org.scalatest.funsuite.AnyFunSuite

/** Crawl-ordering conformance: the reference's EXPECTED_SEQUENCES
  * (tests/backends.py:193-618) replayed through the Scala engine.
  * Encoding: "a1" = http://aaa.com/1, "b12" = http://bbb.com/12,
  * "c111" = http://ccc.com/111 (SITE_03 lives on ccc.com). */
class SequenceSpec extends AnyFunSuite {

  private def url(tok: String): String = tok.head match {
    case 'a' => s"http://aaa.com/${tok.tail}"
    case 'b' => s"http://bbb.com/${tok.tail}"
    case 'c' => s"http://ccc.com/${tok.tail}"
    case _ => sys.error(s"bad token $tok")
  }
  private def seq(tokens: String): List[String] =
    tokens.trim.split("\\s+").map(url).toList

  private def run(graph: CrawlGraph, strategy: CrawlStrategy,
      ordering: QueueOrdering, maxNextRequests: Int): List[String] = {
    val frontier = new LocalFrontier(strategy, partitions = 1, ordering = ordering)
    val tester = new FrontierTester(frontier, graph, maxNextRequests)
    tester.run()
    tester.urlSequence
  }

  private def check(name: String, graph: CrawlGraph, mkStrategy: () => CrawlStrategy,
      ordering: QueueOrdering, cases: Seq[(Int, String)]): Unit =
    cases.foreach { case (mnr, expected) =>
      test(s"$name mnr=$mnr") {
        assert(run(graph, mkStrategy(), ordering, mnr) == seq(expected))
      }
    }

  // ---------------- FIFO (tests/backends.py:193-245) ----------------
  val FIFO_01_A = "a1 a11 a12 a111 a112 a121 a122 a1111 a1112 a1121 a1122 a1211 a1212 a1221 a1222"
  val FIFO_02_A = "a1 b1 a11 a12 b11 b12 a111 a112 a121 a122 b111 b112 b121 b122 " +
    "a1111 a1112 a1121 a1122 a1211 a1212 a1221 a1222 b1111 b1112 b1121 b1122 b1211 b1212 b1221 b1222"
  val FIFO_03_A = "c1 c11 c12 c111 c112 c121 c122 c1111 c1112 c1121 c1122 c1211 c1212 c1221 c1222 " +
    "c11111 c11112 c11121 c11122 c11211 c11212 c11221 c11222 c12111 c12112 c12121 c12122 c12211 c12212 c12221 c12222"

  check("FIFO SITE_01", Graphs.site01, () => new BasicStrategy, QueueOrdering.Fifo,
    Seq(1, 2, 5, 10, 100).map(_ -> FIFO_01_A))
  check("FIFO SITE_02", Graphs.site02, () => new BasicStrategy, QueueOrdering.Fifo,
    Seq(1, 2, 5, 10, 100).map(_ -> FIFO_02_A))
  check("FIFO SITE_03", Graphs.site03, () => new BasicStrategy, QueueOrdering.Fifo,
    Seq(1, 2, 5, 10, 100).map(_ -> FIFO_03_A))

  // ---------------- LIFO (tests/backends.py:248-373) ----------------
  val LIFO_01_A = "a1 a12 a122 a1222 a1221 a121 a1212 a1211 a11 a112 a1122 a1121 a111 a1112 a1111"
  val LIFO_01_B = "a1 a12 a11 a112 a111 a1112 a1111 a1122 a1121 a122 a121 a1212 a1211 a1222 a1221"
  val LIFO_01_C = "a1 a12 a11 a112 a111 a122 a121 a1212 a1211 a1222 a1221 a1112 a1111 a1122 a1121"
  val LIFO_02_A = "b1 b12 b122 b1222 b1221 b121 b1212 b1211 b11 b112 b1122 b1121 b111 b1112 b1111 " +
    "a1 a12 a122 a1222 a1221 a121 a1212 a1211 a11 a112 a1122 a1121 a111 a1112 a1111"
  val LIFO_02_B = "b1 a1 a12 a11 a112 a111 a1112 a1111 a1122 a1121 a122 a121 a1212 a1211 a1222 a1221 " +
    "b12 b11 b112 b111 b1112 b1111 b1122 b1121 b122 b121 b1212 b1211 b1222 b1221"
  val LIFO_02_C = "b1 a1 a12 a11 b12 b11 b112 b111 b122 b121 a112 " +
    "a1122 a1121 b1212 b1211 b1222 b1221 b1112 b1111 b1122 b1121 " +
    "a111 a122 a121 a1212 a1211 a1222 a1221 a1112 a1111"
  val LIFO_02_D = "b1 a1 a12 a11 b12 b11 b112 b111 b122 b121 a112 a111 a122 a121 " +
    "a1212 a1211 a1222 a1221 a1112 a1111 a1122 a1121 " +
    "b1212 b1211 b1222 b1221 b1112 b1111 b1122 b1121"
  val LIFO_03_A = "c1 c12 c122 c1222 c12222 c12221 c1221 c12212 c12211 " +
    "c121 c1212 c12122 c12121 c1211 c12112 c12111 " +
    "c11 c112 c1122 c11222 c11221 c1121 c11212 c11211 " +
    "c111 c1112 c11122 c11121 c1111 c11112 c11111"
  val LIFO_03_B = "c1 c12 c11 c112 c111 " +
    "c1112 c1111 c11112 c11111 c11122 c11121 " +
    "c1122 c1121 c11212 c11211 c11222 c11221 " +
    "c122 c121 c1212 c1211 c12112 c12111 c12122 c12121 " +
    "c1222 c1221 c12212 c12211 c12222 c12221"
  val LIFO_03_C = "c1 c12 c11 c112 c111 c122 c121 " +
    "c1212 c1211 c1222 c1221 c1112 " +
    "c11122 c11121 c12212 c12211 c12222 c12221 c12112 c12111 c12122 c12121 " +
    "c1111 c1122 c1121 c11212 c11211 c11222 c11221 c11112 c11111"
  val LIFO_03_D = "c1 c12 c11 c112 c111 c122 c121 " +
    "c1212 c1211 c1222 c1221 c1112 c1111 c1122 c1121 " +
    "c11212 c11211 c11222 c11221 c11112 c11111 c11122 c11121 " +
    "c12212 c12211 c12222 c12221 c12112 c12111 c12122 c12121"

  check("LIFO SITE_01", Graphs.site01, () => new BasicStrategy, QueueOrdering.Lifo,
    Seq(1 -> LIFO_01_A, 2 -> LIFO_01_B, 5 -> LIFO_01_C, 10 -> LIFO_01_C, 100 -> LIFO_01_C))
  check("LIFO SITE_02", Graphs.site02, () => new BasicStrategy, QueueOrdering.Lifo,
    Seq(1 -> LIFO_02_A, 2 -> LIFO_02_B, 5 -> LIFO_02_C, 10 -> LIFO_02_D, 100 -> LIFO_02_D))
  check("LIFO SITE_03", Graphs.site03, () => new BasicStrategy, QueueOrdering.Lifo,
    Seq(1 -> LIFO_03_A, 2 -> LIFO_03_B, 5 -> LIFO_03_C, 10 -> LIFO_03_D, 100 -> LIFO_03_D))

  // ---------------- DFS (tests/backends.py:376-521) ----------------
  val DFS_01_A = "a1 a11 a111 a1111 a1112 a112 a1121 a1122 a12 a121 a1211 a1212 a122 a1221 a1222"
  val DFS_01_B = "a1 a11 a12 a111 a112 a1111 a1112 a1121 a1122 a121 a122 a1211 a1212 a1221 a1222"
  val DFS_01_C = "a1 a11 a12 a111 a112 a121 a122 a1111 a1112 a1121 a1122 a1211 a1212 a1221 a1222"
  val DFS_02_A = "a1 a11 a111 a1111 a1112 a112 a1121 a1122 a12 a121 a1211 a1212 a122 a1221 a1222 " +
    "b1 b11 b111 b1111 b1112 b112 b1121 b1122 b12 b121 b1211 b1212 b122 b1221 b1222"
  val DFS_02_B = "a1 b1 a11 a12 a111 a112 a1111 a1112 a1121 a1122 a121 a122 a1211 a1212 a1221 a1222 " +
    "b11 b12 b111 b112 b1111 b1112 b1121 b1122 b121 b122 b1211 b1212 b1221 b1222"
  val DFS_02_C = "a1 b1 a11 a12 b11 b12 a111 a112 a121 a122 b111 " +
    "a1111 a1112 a1121 a1122 a1211 a1212 a1221 a1222 b1111 b1112 " +
    "b112 b121 b122 b1121 b1122 b1211 b1212 b1221 b1222"
  val DFS_02_D = "a1 b1 a11 a12 b11 b12 a111 a112 a121 a122 b111 b112 b121 b122 " +
    "a1111 a1112 a1121 a1122 a1211 a1212 a1221 a1222 " +
    "b1111 b1112 b1121 b1122 b1211 b1212 b1221 b1222"
  val DFS_03_A = "c1 c11 c111 c1111 c11111 c11112 c1112 c11121 c11122 " +
    "c112 c1121 c11211 c11212 c1122 c11221 c11222 " +
    "c12 c121 c1211 c12111 c12112 c1212 c12121 c12122 " +
    "c122 c1221 c12211 c12212 c1222 c12221 c12222"
  val DFS_03_B = "c1 c11 c12 c111 c112 c1111 c1112 " +
    "c11111 c11112 c11121 c11122 c1121 c1122 " +
    "c11211 c11212 c11221 c11222 c121 c122 c1211 c1212 " +
    "c12111 c12112 c12121 c12122 c1221 c1222 " +
    "c12211 c12212 c12221 c12222"
  val DFS_03_C = "c1 c11 c12 c111 c112 c121 c122 " +
    "c1111 c1112 c1121 c1122 c1211 " +
    "c11111 c11112 c11121 c11122 c11211 c11212 c11221 c11222 c12111 c12112 " +
    "c1212 c1221 c1222 c12121 c12122 c12211 c12212 c12221 c12222"
  val DFS_03_D = "c1 c11 c12 c111 c112 c121 c122 " +
    "c1111 c1112 c1121 c1122 c1211 c1212 c1221 c1222 " +
    "c11111 c11112 c11121 c11122 c11211 c11212 c11221 c11222 " +
    "c12111 c12112 c12121 c12122 c12211 c12212 c12221 c12222"

  // The published DFS sequences for mnr≥2 pin the SQL backend's stable
  // ORDER BY score ASC, created_at ASC (sqlalchemy/components.py:162-168);
  // the memory heap's equal-score tie order differs there by design (its
  // own mechanics are pinned below and at mnr=1, where both agree).
  check("DFS SITE_01", Graphs.site01, () => new DFSStrategy, QueueOrdering.ScoreCreated,
    Seq(1 -> DFS_01_A, 2 -> DFS_01_B, 5 -> DFS_01_C, 10 -> DFS_01_C, 100 -> DFS_01_C))
  check("DFS SITE_02", Graphs.site02, () => new DFSStrategy, QueueOrdering.ScoreCreated,
    Seq(1 -> DFS_02_A, 2 -> DFS_02_B, 5 -> DFS_02_C, 10 -> DFS_02_D, 100 -> DFS_02_D))
  check("DFS SITE_03", Graphs.site03, () => new DFSStrategy, QueueOrdering.ScoreCreated,
    Seq(1 -> DFS_03_A, 2 -> DFS_03_B, 5 -> DFS_03_C, 10 -> DFS_03_D, 100 -> DFS_03_D))

  // Memory-backend (CPython-heapq) DFS at mnr=1 equals the SQL ordering;
  // its mnr=2 tie order is frozen here (hand-verified against CPython
  // heapq _siftup/_siftdown mechanics — see Heapq.scala).
  check("DFS-heap SITE_01", Graphs.site01, () => new DFSStrategy, QueueOrdering.Score,
    Seq(1 -> DFS_01_A,
        2 -> ("a1 a11 a12 a111 a121 a1111 a1212 a1112 a1211 " +
              "a122 a112 a1221 a1121 a1222 a1122")))

  // ---------------- BFS (tests/backends.py:524-586) ----------------
  val BFS_01_A = "a1 a11 a12 a111 a112 a121 a122 a1111 a1112 a1121 a1122 a1211 a1212 a1221 a1222"
  val BFS_02_A = "a1 b1 a11 a12 b11 b12 a111 a112 a121 a122 b111 b112 b121 b122 " +
    "a1111 a1112 a1121 a1122 a1211 a1212 a1221 a1222 b1111 b1112 b1121 b1122 b1211 b1212 b1221 b1222"
  val BFS_03_A = "c1 c11 c12 c111 c112 c121 c122 " +
    "c1111 c1112 c1121 c1122 c1211 c1212 c1221 c1222 " +
    "c11111 c11112 c11121 c11122 c11211 c11212 c11221 c11222 " +
    "c12111 c12112 c12121 c12122 c12211 c12212 c12221 c12222"

  // BFS ties (equal depth ⇒ equal score) pop FIFO — the SQL backend's
  // ORDER BY score, created_at; the pure heap's tie order differs.
  check("BFS SITE_01", Graphs.site01, () => new BFSStrategy, QueueOrdering.ScoreCreated,
    Seq(1, 2, 5, 10, 100).map(_ -> BFS_01_A))
  check("BFS SITE_02", Graphs.site02, () => new BFSStrategy, QueueOrdering.ScoreCreated,
    Seq(1, 2, 5, 10, 100).map(_ -> BFS_02_A))
  check("BFS SITE_03", Graphs.site03, () => new BFSStrategy, QueueOrdering.ScoreCreated,
    Seq(1, 2, 5, 10, 100).map(_ -> BFS_03_A))

  // DFS must agree across the heap and the SQL ordering on these
  // workloads (SURVEY §2.6 T1/T2).
  check("DFS-sql SITE_03", Graphs.site03, () => new DFSStrategy, QueueOrdering.ScoreCreated,
    Seq(1 -> DFS_03_A, 2 -> DFS_03_B, 5 -> DFS_03_C, 10 -> DFS_03_D, 100 -> DFS_03_D))

  // RANDOM backend property (tests/backends.py:589-618): totals only.
  test("all nodes crawled exactly once (dedup) regardless of batch size") {
    for (mnr <- Seq(1, 2, 5, 10, 100)) {
      val s = run(Graphs.site03, new BasicStrategy, QueueOrdering.Score, mnr)
      assert(s.length == Graphs.site03.nodes.size)
      assert(s.toSet == Graphs.site03.nodes)
    }
  }
}
