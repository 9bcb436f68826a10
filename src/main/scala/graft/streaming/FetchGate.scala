package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-host token-bucket politeness gate — the reference's
  * OverusedBuffer (`contrib/scrapy/overusedbuffer.py`, backed by
  * `utils/heap` pending queues; the scrapy scheduler declares a slot
  * overused at backlog/concurrency > 5.0, `schedulers/frontier.py:
  * 166-176`) as a Structured-Streaming stateful operator:
  *
  * `flatMapGroupsWithState` keyed by politeness slot (host, or the
  * resolved-ip slot key — §2.8 get_slot_key). Per-slot state is a token
  * bucket plus a FIFO backlog: each micro-batch refills `refillPerBatch`
  * tokens up to `capacity`; requests spend one token each, in arrival
  * (`seq`) order, backlog first — the OverusedBuffer `_get_pending`
  * consumption order. Requests beyond the tokens stay in state and flow
  * out in later batches as tokens refill; the backlog is capped at
  * `maxPending` per slot (overflow drops the NEWEST arrivals, keeping
  * the oldest-first fairness of the reference's pending deques).
  *
  * This is the engine's epoch-granular `maxPerHost` politeness
  * re-expressed for an always-on ingest stream: at 10^10-URL scale the
  * state store shards by slot key across executors, exactly like the
  * frontier's host-hash partitioning. */
object FetchGate {

  final case class GateEvent(slot: String, url: String, seq: Long)
  final case class GateState(tokens: Double, pending: List[GateEvent])
  final case class Granted(slot: String, url: String, seq: Long)

  def apply(events: Dataset[GateEvent], capacity: Double,
      refillPerBatch: Double, maxPending: Int = 1000,
      drainIntervalMs: Long = 100): Dataset[Granted] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.slot)
      .flatMapGroupsWithState[GateState, Granted](
        // ProcessingTimeTimeout, NOT NoTimeout: a slot whose producer
        // goes quiet must still drain its backlog as tokens refill (the
        // reference buffer drains on every get_next_requests poll, new
        // input or not); with NoTimeout an idle flooded slot starves
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (slot, incoming, state: GroupState[GateState]) =>
          val prev = state.getOption.getOrElse(GateState(capacity, Nil))
          val tokens = math.min(capacity, prev.tokens + (
            if (state.exists) refillPerBatch else 0.0))
          // backlog first (FIFO), then this batch's arrivals in seq order
          val queue = prev.pending ++ incoming.toList.sortBy(_.seq)
          val n = math.min(queue.length, tokens.toInt)
          val (granted, deferred0) = queue.splitAt(n)
          // cap only what must WAIT: grants never drop to the pending
          // bound (tokens available ⇒ the request goes through this
          // batch); overflow drops the newest deferred arrivals, keeping
          // the oldest-first fairness of the reference's pending deques
          val deferred = deferred0.take(maxPending)
          state.update(GateState(tokens - n, deferred))
          if (deferred.nonEmpty) state.setTimeoutDuration(drainIntervalMs)
          granted.iterator.map(e => Granted(e.slot, e.url, e.seq))
      }
  }
}
