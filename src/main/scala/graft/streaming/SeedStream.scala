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
  * Exactly-once: foreachBatch alone is at-least-once (a crash between
  * the frontier commit and the streaming-checkpoint commit replays the
  * micro-batch), so the sink is made idempotent with the batchId — the
  * last applied batchId commits ATOMICALLY with the seed rows as a queue
  * manifest prop, and replayed batches (id <= marker) are skipped. Seeds
  * bypass the URL-seen check, so without this marker a replay would
  * schedule duplicates. */
final class SeedStream(frontier: SparkFrontier, seedsDir: String) {

  private val markerKey = "seedstream.lastBatch"

  private[streaming] def lastApplied: Long =
    frontier.queue.readManifest().props.get(markerKey).map(_.toLong).getOrElse(-1L)

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
        if (batchId > lastApplied) {
          val urls = batch
            .select(trim(col("value")).as("url"))
            .filter(length(col("url")) > 0 && !col("url").startsWith("#"))
            .distinct()
          frontier.addSeedsDF(urls, props = Map(markerKey -> batchId.toString))
        }
      }
      .start()
}
