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
  * frontier via foreachBatch. The stream checkpoint gives exactly-once
  * file ingestion across restarts (a re-started stream skips files it
  * already scheduled) — the streaming analog of the engine's
  * manifest-epoch resume. */
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
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val urls = batch
          .select(trim(col("value")).as("url"))
          .filter(length(col("url")) > 0 && !col("url").startsWith("#"))
          .distinct()
        frontier.addSeedsDF(urls)
      }
      .start()
}
