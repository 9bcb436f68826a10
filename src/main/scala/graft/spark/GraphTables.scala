package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.local.CrawlGraph
import graft.images.ImageSynth
import scala.collection.mutable

/** Builders for the synthetic web tables: the links table (the "internet"
  * the crawler walks) and the image+caption payload table (input_hint
  * shape) keyed by image_id == URL fingerprint. Generation runs on
  * executors (Dataset.map), deterministically per URL. */
object GraphTables {

  /** BFS depth of every node from the seeds (caption ground truth). */
  def depths(graph: CrawlGraph): Map[String, Int] = {
    val d = mutable.HashMap.empty[String, Int]
    var frontier = graph.seeds.toList
    frontier.foreach(s => d(s) = 0)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap { u =>
        graph.linksOf(u).flatMap { l =>
          if (!d.contains(l)) { d(l) = d(u) + 1; Some(l) } else None
        }
      }
    }
    d.toMap
  }

  def webDF(spark: SparkSession, graph: CrawlGraph): DataFrame = {
    import spark.implicits._
    graph.pages.map { case (u, ls) => (u, ls) }.toDF("url", "outlinks")
  }

  /** input_hint table: (image_id, bytes, w, h, fmt, caption, phash). */
  def imagesDS(spark: SparkSession, graph: CrawlGraph,
      w: Int = 64, h: Int = 64): Dataset[ImageSynth.ImageRow] = {
    import spark.implicits._
    val ds = depths(graph)
    val urls = graph.nodes.toSeq.sorted.map(u => (u, ds.getOrElse(u, 0)))
    spark.createDataset(urls)
      .repartition(spark.sparkContext.defaultParallelism)
      .map { case (url, depth) => ImageSynth.rowFor(url, depth, w, h) }
  }

  /** Distributed per-row payload verification: decoded-pixel check
    * (exact for png, PSNR≥40dB for jpeg) + caption equality. Input must
    * carry (url, depth) next to the payload columns. Runs on executors. */
  def verifyPayload(rows: Dataset[(String, Int, ImageSynth.ImageRow)]): Long = {
    import rows.sparkSession.implicits._
    rows.map { case (url, depth, row) =>
      if (ImageSynth.verifyRow(url, depth, row)) 0L else 1L
    }.reduce(_ + _)
  }
}
