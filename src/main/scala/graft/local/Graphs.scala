package graft.local

import scala.collection.mutable

/** Synthetic crawl graphs (ports of the reference fixtures,
  * frontera/utils/graphs/data.py). A graph is page-url -> ordered outlinks;
  * seeds are the first page of each site (graphs/manager.py is_seed). */
final case class CrawlGraph(pages: Vector[(String, Vector[String])],
    seeds: Vector[String]) {
  private val linkMap: Map[String, Vector[String]] = pages.toMap
  def linksOf(url: String): Vector[String] = linkMap.getOrElse(url, Vector.empty)
  def nodes: Set[String] =
    pages.flatMap { case (p, ls) => p +: ls }.toSet ++ seeds
}

object Graphs {

  /** create_test_site (reference graphs/data.py:5-23): full n-ary tree of
    * `prefix + digits`; with selfLink each page also links to itself. */
  def createTestSite(prefix0: String, maxDepth: Int, nLinks: Int,
      selfLink: Boolean = false): Vector[(String, Vector[String])] = {
    val site = mutable.ArrayBuffer.empty[(String, Vector[String])]
    def rec(prefix: String, depth: Int): Unit = {
      if (depth + 1 < maxDepth) {
        val page = prefix
        val links = (1 to nLinks).map(l => page + l).toVector
        site.append((page, if (selfLink) links :+ page else links))
        links.foreach(link => rec(link, depth + 1))
      }
    }
    rec(prefix0 + "1", 0)
    site.toVector
  }

  /** Seed rule of the reference manager (graphs/manager.py:33-41, 57-66):
    * `add_page(is_seed = i==0)` uses get_or_create — a site's first page
    * is a seed only if no earlier site already created it (e.g. as a
    * link target). SITE_09's third site head test.cloud.c.com is linked
    * from b.com first ⇒ NOT a seed. */
  private def graphOfSites(sites: Vector[Vector[(String, Vector[String])]]): CrawlGraph = {
    val seen = mutable.HashSet.empty[String]
    val seeds = mutable.ArrayBuffer.empty[String]
    sites.foreach { site =>
      site.zipWithIndex.foreach { case ((page, links), i) =>
        if (!seen.contains(page) && i == 0) seeds.append(page)
        seen.add(page)
        links.foreach(seen.add)
      }
    }
    CrawlGraph(sites.flatten, seeds.toVector)
  }

  val siteA: Vector[(String, Vector[String])] = createTestSite("http://aaa.com/", 4, 2)
  val siteB: Vector[(String, Vector[String])] = createTestSite("http://bbb.com/", 4, 2)
  val siteC: Vector[(String, Vector[String])] = createTestSite("http://ccc.com/", 5, 2, selfLink = true)

  /** SITE_01/02/03 (data.py:84-104). */
  val site01: CrawlGraph = graphOfSites(Vector(siteA))
  val site02: CrawlGraph = graphOfSites(Vector(siteA, siteB))
  val site03: CrawlGraph = graphOfSites(Vector(siteC))

  /** SITE_09 (data.py:185-223): multi-domain with cross-links + query URLs. */
  val site09: CrawlGraph = graphOfSites(Vector(
    Vector(
      ("https://www.a.com", Vector(
        "http://www.a.com/2", "http://www.a.com/2/1", "http://www.a.com/3",
        "http://www.a.com/2/1/3", "http://www.a.com/2/4/1",
        "http://www.a.com/2/4/2", "http://www.a.net"))),
    Vector(
      ("http://b.com", Vector(
        "http://b.com/2", "http://www.a.net", "http://test.cloud.c.com",
        "http://b.com")),
      ("http://b.com/entries?page=2", Vector(
        "http://b.com/entries?page=2", "http://b.com"))),
    Vector(
      ("http://test.cloud.c.com", Vector(
        "http://cloud.c.com", "http://test.cloud.c.com/2")),
      ("http://test.cloud.c.com/2", Vector(
        "http://b.com/entries?page=2", "http://test.cloud.c.com")))))

  /** Parameterized bench frontier: H hosts × an F-ary tree of depth D with
    * zipf-ish skew (host 0 gets `skew`× the tree of the median host).
    * Deterministic (no RNG). */
  def benchGraph(hosts: Int, depth: Int, fanout: Int, skewHost: Int = 0,
      skewFactor: Int = 1): CrawlGraph = {
    val sites = (0 until hosts).toVector.map { h =>
      val d = if (h == skewHost && skewFactor > 1)
        depth + (math.log(skewFactor.toDouble) / math.log(fanout.toDouble)).ceil.toInt
      else depth
      createTestSite(s"http://host$h.example/", d, fanout)
    }
    graphOfSites(sites)
  }
}

/** Downloader simulators (reference frontera/utils/tester.py:98-153). */
class BaseDownloaderSimulator {
  def update(requests: List[LocalRequest]): Unit = {}
  private var last: List[LocalRequest] = Nil
  def updateAndHold(requests: List[LocalRequest]): Unit = last = requests
  def download(): List[LocalRequest] = { val r = last; last = Nil; r }
  def overusedKeys: List[String] = Nil
  def idle: Boolean = true
}

/** Rate-limited per-host slots: each iteration downloads ≤rate requests
  * per host; a host is overused when its backlog > rate. */
final class DownloaderSimulator(rate: Int) extends BaseDownloaderSimulator {
  private val slots = mutable.LinkedHashMap.empty[String, mutable.ArrayDeque[LocalRequest]]
  override def updateAndHold(requests: List[LocalRequest]): Unit =
    requests.foreach { r =>
      slots.getOrElseUpdate(r.hostname, mutable.ArrayDeque.empty).append(r)
    }
  override def download(): List[LocalRequest] = {
    val out = mutable.ListBuffer.empty[LocalRequest]
    val trash = mutable.ListBuffer.empty[String]
    slots.foreach { case (key, requests) =>
      (0 until math.min(requests.length, rate)).foreach(_ => out.append(requests.removeHead()))
      if (requests.isEmpty) trash.append(key)
    }
    trash.foreach(slots.remove)
    out.toList
  }
  override def overusedKeys: List[String] =
    slots.collect { case (k, reqs) if reqs.length > rate => k }.toList
  override def idle: Boolean = slots.isEmpty
}

/** FrontierTester port (reference frontera/utils/tester.py:13-95): the
  * iteration loop every sequence oracle is defined against. */
final class FrontierTester(frontier: LocalFrontier, graph: CrawlGraph,
    maxNextRequests: Int = 0,
    downloader: BaseDownloaderSimulator = new BaseDownloaderSimulator) {

  /** (requests, iteration, overusedKeys) per loop pass. */
  val sequence: mutable.ArrayBuffer[(List[LocalRequest], Int, List[String])] =
    mutable.ArrayBuffer.empty

  def run(): Unit = {
    frontier.addSeeds(graph.seeds)
    var continue = true
    while (continue) {
      val overused = downloader.overusedKeys
      val requests = frontier.getNextRequests(maxNextRequests, overused)
      sequence.append((requests, frontier.iteration, overused))
      downloader.updateAndHold(requests)
      for (page <- downloader.download()) {
        frontier.pageCrawled(page)
        frontier.linksExtracted(page, graph.linksOf(page.url))
      }
      if (requests.isEmpty && downloader.idle) continue = false
    }
  }

  def urlSequence: List[String] = sequence.toList.flatMap(_._1.map(_.url))
}
