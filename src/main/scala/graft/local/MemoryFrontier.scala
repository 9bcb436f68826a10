package graft.local

import graft.core.{Hashing, PyHeapq}
import scala.collection.mutable

/** Queue orderings of the reference backends:
  *  - Score: per-partition min-heap on score, CPython-heapq tie mechanics
  *    (contrib/backends/memory/__init__.py:51-79; the sqlalchemy default
  *    `ORDER BY score ASC, created_at ASC` agrees on these workloads)
  *  - Fifo / Lifo: `ORDER BY created_at ASC / DESC`
  *    (contrib/backends/sqlalchemy/components.py:162-168)
  */
sealed trait QueueOrdering
object QueueOrdering {
  /** memory backend: CPython-heapq min-heap on score (tie order = heap
    * array mechanics) — pins the DFS oracles. */
  case object Score extends QueueOrdering
  /** sqlalchemy default: ORDER BY score ASC, created_at ASC (stable FIFO
    * within a score) — pins the BFS oracles. */
  case object ScoreCreated extends QueueOrdering
  /** HBase/Redis semantics: HIGHEST score first (rowkey embeds 1-score,
    * hbase/__init__.py:176-177; zrevrange) — the ordering the shipped
    * discovery strategy's 0.9/0.8/0.7/0.5 scores are designed for. */
  case object ScoreCreatedDesc extends QueueOrdering
  case object Fifo extends QueueOrdering
  case object Lifo extends QueueOrdering
}

trait FrontierQueue {
  def schedule(batch: Seq[QueueEntry]): Unit
  def getNextRequests(maxN: Int, partitionId: Int): List[LocalRequest]
  def count: Int
}

/** Partitioned in-memory frontier queue. Partition of a request =
  * signed-crc32(hostname) python-mod n (Crc32NamePartitioner). */
final class MemoryQueue(partitions: Int, ordering: QueueOrdering = QueueOrdering.Score)
    extends FrontierQueue {

  private def cmp(a: Double, b: Double): Int = java.lang.Double.compare(a, b)
  // HeapObjectWrapper.__lt__ : comparator == -1 (utils/heap.py:38-43)
  private val lt: (LocalRequest, LocalRequest) => Boolean =
    (a, b) => cmp(a.scr, b.scr) < 0

  private val heaps: Array[PyHeapq[LocalRequest]] =
    Array.fill(partitions)(new PyHeapq[LocalRequest](lt))
  // FIFO/LIFO: stable created-order buffers (created_at == seq counter)
  private val buffers: Array[mutable.ArrayDeque[LocalRequest]] =
    Array.fill(partitions)(mutable.ArrayDeque.empty[LocalRequest])
  // ScoreCreated[Desc]: binary heap on (±score, seq) — seq keeps it stable
  private var seq = 0L
  private val scoreSign =
    if (ordering == QueueOrdering.ScoreCreatedDesc) -1.0 else 1.0
  private val ordered: Array[java.util.PriorityQueue[(Double, Long, LocalRequest)]] =
    Array.fill(partitions)(new java.util.PriorityQueue[(Double, Long, LocalRequest)](
      11, (x: (Double, Long, LocalRequest), y: (Double, Long, LocalRequest)) => {
        val c = java.lang.Double.compare(x._1, y._1)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }))

  def partitionOf(request: LocalRequest): Int =
    if (request.hostname.isEmpty) 0
    else Hashing.crc32Partition(request.hostname, partitions)

  override def schedule(batch: Seq[QueueEntry]): Unit =
    batch.foreach { case QueueEntry(_, score, request, doSchedule) =>
      if (doSchedule) {
        request.scr = score
        val pid = partitionOf(request)
        ordering match {
          case QueueOrdering.Score => heaps(pid).push(request)
          case QueueOrdering.ScoreCreated | QueueOrdering.ScoreCreatedDesc =>
            ordered(pid).add((scoreSign * score, seq, request)); seq += 1
          case _ => buffers(pid).append(request)
        }
      }
    }

  override def getNextRequests(maxN: Int, partitionId: Int): List[LocalRequest] =
    ordering match {
      case QueueOrdering.Score => heaps(partitionId).popN(maxN)
      case QueueOrdering.ScoreCreated | QueueOrdering.ScoreCreatedDesc =>
        val q = ordered(partitionId)
        val n = if (maxN > 0) math.min(maxN, q.size) else q.size
        (0 until n).map(_ => q.poll()._3).toList
      case QueueOrdering.Fifo =>
        val buf = buffers(partitionId)
        val n = if (maxN > 0) math.min(maxN, buf.length) else buf.length
        (0 until n).map(_ => buf.removeHead()).toList
      case QueueOrdering.Lifo =>
        val buf = buffers(partitionId)
        val n = if (maxN > 0) math.min(maxN, buf.length) else buf.length
        (0 until n).map(_ => buf.removeLast()).toList
    }

  override def count: Int =
    heaps.map(_.size).sum + buffers.map(_.length).sum + ordered.map(_.size).sum
}

/** Exact URL-seen state store (memory backend MemoryStates,
  * contrib/backends/memory/__init__.py:82-110). */
final class MemoryStates {
  private val cache = mutable.HashMap.empty[String, Int]
  def setStates(requests: Seq[LocalRequest]): Unit =
    requests.foreach(r => r.state = cache.getOrElse(r.fingerprint, States.Default))
  def updateCache(requests: Seq[LocalRequest]): Unit =
    requests.foreach(r => cache(r.fingerprint) = r.state)
  def get(fingerprint: String): Int = cache.getOrElse(fingerprint, States.Default)
  def snapshot: Map[String, Int] = cache.toMap
}
