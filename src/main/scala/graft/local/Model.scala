package graft.local

import graft.core.{Hashing, UrlUtil}

/** URL-seen states (reference frontera/core/components.py:97-101). */
object States {
  val NotCrawled = 0
  val Queued = 1
  val Crawled = 2
  val Error = 3
  val Default: Int = NotCrawled
}

/** In-process request object for the conformance oracle — the mutable
  * `meta` dict of the reference (frontera/core/models.py:12-90) collapsed
  * to the typed fields the pipeline actually reads. */
final class LocalRequest(val url: String) {
  val fingerprint: String = Hashing.urlFingerprint(url)
  val hostname: String = UrlUtil.slotKey(url)
  var depth: Int = 0
  var state: Int = States.Default
  /** meta[b'_scr'] — the heap comparator key (memory/__init__.py:78-79). */
  var scr: Double = 0.0
  override def toString: String = url
}

/** (fingerprint, score, request, schedule) — the scheduled-stream tuple
  * (frontera/core/components.py:73-80). */
final case class QueueEntry(fingerprint: String, score: Double,
    request: LocalRequest, schedule: Boolean)
