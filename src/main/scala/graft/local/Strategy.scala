package graft.local

/** Crawling strategy interface (reference frontera/strategy/__init__.py:7-151)
  * reduced to the calls the conformance pipeline makes. `schedule` feeds the
  * scheduled stream (LocalUpdateScoreStream → queue.schedule,
  * core/manager.py:788-798). */
abstract class CrawlStrategy {
  private var stream: QueueEntry => Unit = _ => ()
  private[local] def bind(send: QueueEntry => Unit): Unit = stream = send

  final def schedule(request: LocalRequest, score: Double = 1.0,
      dontQueue: Boolean = false): Unit =
    stream(QueueEntry(request.fingerprint, score, request, !dontQueue))

  def readSeeds(urls: Seq[String]): Unit
  def pageCrawled(response: LocalRequest): Unit
  def filterExtractedLinks(request: LocalRequest,
      links: Seq[LocalRequest]): Seq[LocalRequest] = links
  def linksExtracted(request: LocalRequest, links: Seq[LocalRequest]): Unit
  def requestError(request: LocalRequest, error: String): Unit =
    request.state = States.Error
}

/** tests/backends.py:12-48 BasicCrawlingStrategy: seeds at default score
  * 1.0; NOT_CRAWLED links re-scheduled at 1.0 and marked QUEUED. */
class BasicStrategy extends CrawlStrategy {
  override def readSeeds(urls: Seq[String]): Unit =
    urls.foreach(u => schedule(new LocalRequest(u)))
  override def pageCrawled(response: LocalRequest): Unit =
    response.state = States.Crawled
  override def linksExtracted(request: LocalRequest, links: Seq[LocalRequest]): Unit =
    links.foreach { link =>
      if (link.state == States.NotCrawled) {
        schedule(new LocalRequest(link.url))
        link.state = States.Queued
      }
    }
}

/** tests/backends.py:50-68 DFSCrawlingStrategy: score 1/(depth+1); the
  * min-heap then pops deepest first. */
class DFSStrategy extends BasicStrategy {
  protected def getScore(depth: Int): Double = 1.0 / (depth + 1.0)
  override def readSeeds(urls: Seq[String]): Unit =
    urls.foreach { u =>
      val r = new LocalRequest(u)
      r.depth = 0
      schedule(r, getScore(0))
    }
  override def linksExtracted(request: LocalRequest, links: Seq[LocalRequest]): Unit =
    links.foreach { link =>
      if (link.state == States.NotCrawled) {
        val r = new LocalRequest(link.url)
        r.depth = request.depth + 1
        schedule(r, getScore(r.depth))
        link.state = States.Queued
      }
    }
  /** carry depth through the fetch: response IS the queued request here */
}

/** tests/backends.py:71-73 BFSCrawlingStrategy: score depth/10 — the
  * min-heap pops shallowest first. */
class BFSStrategy extends DFSStrategy {
  override protected def getScore(depth: Int): Double = depth / 10.0
}

/** Shipped strategies (frontera/strategy/depth.py:19-42): BFS 1-d/(d+1),
  * DFS d/(d+1). Note shipped-BFS + min-heap pops deepest first; the
  * conformance sequences are pinned by the test strategies above. */
class ShippedBFSStrategy extends DFSStrategy {
  override protected def getScore(depth: Int): Double = 1.0 - depth.toDouble / (depth + 1)
}
class ShippedDFSStrategy extends DFSStrategy {
  override protected def getScore(depth: Int): Double = depth.toDouble / (depth + 1)
}
