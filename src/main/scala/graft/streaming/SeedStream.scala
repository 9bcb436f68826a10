package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.spark.SparkFrontier

/** Structured-Streaming seed ingestion — the reference's add-seeds path
  * (frontera/utils/add_seeds.py, worker/strategy.py:205-231: seed files
  * from local/S3 streams) as a real `readStream`:
  *
  * a file-source stream watches a directory of seed lists; every
  * micro-batch is trimmed, comment-filtered, and scheduled into the
  * frontier via foreachBatch.
  *
  * Delivery: foreachBatch alone is at-least-once (a crash between the
  * frontier commit and the streaming-checkpoint commit replays the
  * micro-batch). The sink is idempotent by CONTENT: `addSeedsDF` follows
  * the shipped read_seeds semantics — it refreshes states, schedules
  * only NOT_CRAWLED urls, and marks them QUEUED — so a replayed (or,
  * after a checkpoint reset, re-offered) seed file dedupes against the
  * states table while genuinely new URLs always schedule. A batchId
  * high-water mark would NOT survive a checkpoint reset (batch ids
  * restart at 0 and new files would be dropped).
  *
  * Known at-least-once window (deliberate): addSeedsDF appends to the
  * queue BEFORE merging the QUEUED states — a crash exactly between
  * those two commits followed by a replay re-appends the same queue
  * rows (the states anti-join doesn't see them yet), so those seeds can
  * be fetched twice. The ordering is the safe one (the reverse would
  * LOSE seeds: states-first + crash = URLs marked seen but never
  * queued); the crawl itself stays exact because the second fetch hits
  * the URL-seen states check at link-processing time. */
final class SeedStream(frontier: SparkFrontier, seedsDir: String) {

  /** Process everything currently in the directory, then stop
    * (Trigger.AvailableNow). Call again after new files land, or use
    * `startContinuous` for an always-on micro-batch stream. */
  def ingestAvailable(): Unit = {
    val q = build(Trigger.AvailableNow())
    q.awaitTermination()
  }

  def startContinuous(intervalMs: Long = 1000): StreamingQuery =
    build(Trigger.ProcessingTime(intervalMs))

  private def build(trigger: Trigger): StreamingQuery =
    frontier.spark.readStream
      .option("maxFilesPerTrigger", 64)
      .text(seedsDir)
      .writeStream
      .queryName("graft-seed-ingest")
      .option("checkpointLocation", s"${frontier.root}/seedstream-ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val urls = batch
          .select(trim(col("value")).as("url"))
          .filter(length(col("url")) > 0 && !col("url").startsWith("#"))
          .distinct()
        frontier.addSeedsDF(urls,
          props = Map("seedstream.lastBatch" -> batchId.toString))
      }
      .start()
}
