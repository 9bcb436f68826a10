package graft.images

import org.scalatest.funsuite.AnyFunSuite
import graft.local.Graphs
import graft.spark.{GraphTables, SparkTestBase, SparkFrontier, SparkCrawler, ScoreStrategy}
import java.nio.file.Files

class ImageSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("png row round-trips exactly; jpeg row clears 40dB PSNR; captions match") {
    // find one host of each parity so both formats are covered
    val pngUrl = "http://aaa.com/1"   // fmt by signed_crc32(host) parity
    val jpgUrl = "http://bbb.com/1"
    val rows = Seq(pngUrl, jpgUrl).map(u => ImageSynth.rowFor(u, 0))
    val fmts = rows.map(_.fmt).toSet
    assert(fmts == Set("png", "jpeg"), s"expected both formats, got $fmts")
    Seq(pngUrl, jpgUrl).zip(rows).foreach { case (u, r) =>
      assert(ImageSynth.verifyRow(u, 0, r), s"payload invariant failed for $u")
      assert(!ImageSynth.verifyRow(u, 1, r), "caption must bind the depth")
    }
    // phash is stable and format-independent (computed pre-encode)
    assert(ImageSynth.rowFor(pngUrl, 0).phash == rows.head.phash)
  }

  test("fetch-join delivers verifiable payloads for a full crawl (distributed)") {
    import spark.implicits._
    val graph = Graphs.site02
    val images = GraphTables.imagesDS(spark, graph).cache()
    assert(images.count() == graph.nodes.size)

    val root = Files.createTempDirectory("graft-img").toString
    val frontier = new SparkFrontier(spark, root, partitions = 4,
      stateBuckets = 4, strategy = ScoreStrategy.BFS, globalOrder = true)
    frontier.addSeeds(graph.seeds)
    val crawler = new SparkCrawler(frontier, GraphTables.webDF(spark, graph),
      100, images = Some(images.toDF()))
    val seq = crawler.run()
    assert(seq.toSet == graph.nodes)

    // every crawled URL joins to its payload row; invariant holds per row
    val depths = GraphTables.depths(graph)
    val crawled = spark.createDataset(seq.map(u => (u, depths(u))))
      .toDF("url", "depth")
      .withColumn("image_id_expect", graft.spark.FrontierExprs.url_fingerprint($"url"))
    val joined = crawled.join(images, $"image_id_expect" === $"image_id")
    assert(joined.count() == graph.nodes.size, "fetch-join must hit every row")
    val failures = GraphTables.verifyPayload(
      joined.select($"url", $"depth",
        org.apache.spark.sql.functions.struct(
          $"image_id", $"bytes", $"w", $"h", $"fmt", $"caption", $"phash"))
        .as[(String, Int, ImageSynth.ImageRow)])
    assert(failures == 0)
  }
}
