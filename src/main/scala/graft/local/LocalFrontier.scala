package graft.local

import scala.collection.mutable

/** Single-process frontier manager — the conformance oracle.
  * Mirrors LocalFrontierManager (reference frontera/core/manager.py:302-611)
  * plus the MemoryDistributedBackend partition loop
  * (contrib/backends/memory/__init__.py:152-161):
  *
  *  - add_seeds → strategy.read_seeds → schedule → queue (manager.py:486-495)
  *  - get_next_requests: MAX_REQUESTS end-condition, batch arithmetic,
  *    n_requests/iteration counters (manager.py:497-536)
  *  - page_crawled: set_states → strategy → update_cache (manager.py:538-553)
  *  - links_extracted: middleware (fingerprint/domain — implicit in
  *    LocalRequest) → filter_extracted_links → set_states(filtered) →
  *    strategy.links_extracted → update_cache(filtered) (manager.py:555-570)
  */
final class LocalFrontier(
    val strategy: CrawlStrategy,
    partitions: Int = 1,
    ordering: QueueOrdering = QueueOrdering.Score,
    maxRequests: Int = 0,
    defaultMaxNextRequests: Int = 64,
    politeness: Option[OverusedBuffer] = None) {

  val queue = new MemoryQueue(partitions, ordering)
  val states = new MemoryStates
  private var _iteration = 0
  private var _nRequests = 0
  private var _finished = false

  strategy.bind(entry => queue.schedule(Seq(entry)))

  def iteration: Int = _iteration
  def nRequests: Int = _nRequests
  def finished: Boolean = _finished

  def addSeeds(urls: Seq[String]): Unit = strategy.readSeeds(urls)

  private def backendGet(maxN: Int, overusedKeys: Set[String]): List[LocalRequest] = {
    val raw = (0 until partitions).toList.flatMap(p => queue.getNextRequests(maxN, p))
    raw
  }

  def getNextRequests(maxNextRequests: Int = 0,
      overusedKeys: Seq[String] = Nil): List[LocalRequest] = {
    if (maxRequests > 0 && _nRequests >= maxRequests) { _finished = true; return Nil }
    var maxN = if (maxNextRequests > 0) maxNextRequests else defaultMaxNextRequests
    if (maxRequests > 0 && _nRequests + maxN > maxRequests)
      maxN = maxRequests - _nRequests
    val next = politeness match {
      case Some(buffer) =>
        buffer.getNextRequests(maxN, overusedKeys.toSet,
          n => backendGet(n, overusedKeys.toSet))
      case None => backendGet(maxN, overusedKeys.toSet)
    }
    _nRequests += next.length
    if (next.nonEmpty) _iteration += 1
    next
  }

  def pageCrawled(response: LocalRequest): Unit = {
    states.setStates(Seq(response))
    strategy.pageCrawled(response)
    states.updateCache(Seq(response))
  }

  def linksExtracted(request: LocalRequest, linkUrls: Seq[String]): Unit = {
    val links = linkUrls.map(new LocalRequest(_))
    val filtered = strategy.filterExtractedLinks(request, links)
    if (filtered.nonEmpty) {
      states.setStates(filtered)
      strategy.linksExtracted(request, filtered)
      states.updateCache(filtered)
    }
  }

  def requestError(request: LocalRequest, error: String): Unit = {
    states.setStates(Seq(request))
    strategy.requestError(request, error)
    states.updateCache(Seq(request))
  }
}

/** Politeness buffer (reference frontera/core/__init__.py:28-110).
  * Deterministic variant: pending keys iterate in insertion order (the
  * reference iterates a Python set — see SURVEY §2.9.5; the published
  * oracles are insensitive to this because ≤1 key is pending at a time). */
final class OverusedBuffer(
    maxPerKey: Option[Int] = None, keepPerKey: Int = 1000,
    maxKeys: Option[Int] = None, keepKeys: Int = 100) {

  private val pending = mutable.LinkedHashMap.empty[String, mutable.ArrayDeque[LocalRequest]]
  // deterministic stand-in for random.sample in _check_and_purge_keys:
  // keep the most recently inserted keys
  def pendingCount: Int = pending.valuesIterator.map(_.length).sum
  def keyCount: Int = pending.size

  private def checkAndPurge(key: String): Unit =
    maxPerKey.foreach { maxPK =>
      pending.get(key).foreach { dq =>
        if (dq.length > maxPK) {
          while (dq.length > keepPerKey) dq.removeHead() // drops oldest
        }
      }
    }

  private def checkAndPurgeKeys(): Unit =
    maxKeys.foreach { maxK =>
      if (pending.size > maxK) {
        val keep = pending.keys.toList.takeRight(keepKeys).toSet
        pending.filterInPlace((k, _) => keep.contains(k))
      }
    }

  private def getPending(maxN: Int, overused: Set[String]): List[LocalRequest] = {
    val out = mutable.ListBuffer.empty[LocalRequest]
    var keys = pending.keys.filterNot(overused.contains).toList
    // round-robin, one per key per sweep; a sweep completes even past maxN
    // (the reference generator checks `i < max_n_requests` only between
    // sweeps, core/__init__.py:54-66); empty keys are dropped on the
    // *next* pop attempt, exactly like the IndexError branch.
    while (out.length < maxN && keys.nonEmpty) {
      keys = keys.filter { key =>
        pending.get(key) match {
          case Some(dq) if dq.nonEmpty =>
            out.append(dq.removeHead())
            checkAndPurge(key)
            true
          case _ => pending.remove(key); false
        }
      }
    }
    out.toList
  }

  def getNextRequests(maxN: Int, overused: Set[String],
      get: Int => List[LocalRequest]): List[LocalRequest] = {
    checkAndPurgeKeys()
    val requests = mutable.ListBuffer.empty[LocalRequest]
    requests ++= getPending(maxN, overused)
    if (requests.length >= maxN) return requests.toList
    get(maxN - requests.length).foreach { request =>
      val key = request.hostname
      if (overused.contains(key)) {
        pending.getOrElseUpdate(key, mutable.ArrayDeque.empty).append(request)
        if (maxPerKey.isDefined) checkAndPurge(key)
      } else requests.append(request)
    }
    requests.toList
  }
}
