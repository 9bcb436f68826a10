package graft.core

import scala.collection.mutable.ArrayBuffer

/** Exact re-implementation of CPython's `heapq` array mechanics.
  *
  * The reference frontier's memory queue (reference:
  * frontera/utils/heap.py:57-81, frontera/contrib/backends/memory/__init__.py:78-79)
  * pops the *lowest-scored* request first, and — crucially — breaks ties
  * purely by heapq's `_siftdown`/`_siftup` array layout plus the
  * pop-last-swap-root step. The published crawl-ordering oracles
  * (reference: tests/backends.py:193-618) depend on that layout, so this
  * port follows CPython's heapq.py line-for-line: same comparisons
  * (strictly `lt`, never `lte`), same sift directions, same append/pop
  * mechanics.
  *
  * `lt(a, b)` must mirror the reference's `HeapObjectWrapper.__lt__`
  * (heap.py:38-43): true iff the comparator returns -1.
  */
final class PyHeapq[T](lt: (T, T) => Boolean) {
  val heap: ArrayBuffer[T] = ArrayBuffer.empty[T]

  def size: Int = heap.length
  def isEmpty: Boolean = heap.isEmpty

  /** CPython heappush: append then _siftdown(0, len-1). */
  def push(item: T): Unit = {
    heap.append(item)
    siftdown(0, heap.length - 1)
  }

  /** CPython heappop: pop last; if non-empty, swap into root and _siftup. */
  def pop(): Option[T] = {
    if (heap.isEmpty) return None
    val lastelt = heap.remove(heap.length - 1)
    if (heap.nonEmpty) {
      val returnitem = heap(0)
      heap(0) = lastelt
      siftup(0)
      Some(returnitem)
    } else Some(lastelt)
  }

  /** Reference Heap.pop(n) (heap.py:65-81): n==0 drains everything. */
  def popN(n: Int): List[T] = {
    val out = ArrayBuffer.empty[T]
    var page = pop()
    while (page.isDefined) {
      out.append(page.get)
      if (n > 0 && out.length >= n) return out.toList
      page = pop()
    }
    out.toList
  }

  // CPython heapq._siftdown(heap, startpos, pos)
  private def siftdown(startpos: Int, pos0: Int): Unit = {
    var pos = pos0
    val newitem = heap(pos)
    var done = false
    while (!done && pos > startpos) {
      val parentpos = (pos - 1) >> 1
      val parent = heap(parentpos)
      if (lt(newitem, parent)) {
        heap(pos) = parent
        pos = parentpos
      } else done = true
    }
    heap(pos) = newitem
  }

  // CPython heapq._siftup(heap, pos): bubble the smaller child up to the
  // leaf level, then sift the moved-in item back down.
  private def siftup(pos0: Int): Unit = {
    val endpos = heap.length
    val startpos = pos0
    var pos = pos0
    val newitem = heap(pos)
    var childpos = 2 * pos + 1
    while (childpos < endpos) {
      val rightpos = childpos + 1
      if (rightpos < endpos && !lt(heap(childpos), heap(rightpos)))
        childpos = rightpos
      heap(pos) = heap(childpos)
      pos = childpos
      childpos = 2 * pos + 1
    }
    heap(pos) = newitem
    siftdown(startpos, pos)
  }
}
