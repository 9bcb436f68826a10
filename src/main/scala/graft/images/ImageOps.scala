package graft.images

import java.awt.image.BufferedImage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed image transforms over the input_hint table
  * `(image_id, bytes, w, h, fmt, caption, phash)` — the REAL multimodal
  * decode path (javax.imageio on executors; no stubbed codec): decode →
  * transform → re-encode as whole-row work inside a Scala UDF, the JVM
  * analog of a `mapInPandas` batch transform. Each executor thread
  * reuses its thread-local readers/writers from ImageSynth, so the hot
  * loop never rescans the codec registry. */
object ImageOps {

  /** Decode + bilinear-resize + re-encode one payload. PNG stays
    * lossless PNG; everything else re-encodes JPEG. Deterministic:
    * the same bytes resize to the same bytes on every executor. */
  def resize(bytes: Array[Byte], outW: Int, outH: Int, fmt: String): Array[Byte] = {
    val src = ImageSynth.decode(bytes)
    val dst = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, outW, outH, null)
    } finally g.dispose()
    val px = dst.getRGB(0, 0, outW, outH, null, 0, outW)
    if (fmt == "png") ImageSynth.encodePng(px, outW, outH)
    else ImageSynth.encodeJpeg(px, outW, outH)
  }

  /** Mean per-channel intensity — the feature-extract step's shape
    * (decode once, fold pixels into a small typed vector). */
  def meanRgb(bytes: Array[Byte]): Array[Double] = {
    val img = ImageSynth.decode(bytes)
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val acc = new Array[Double](3)
    var i = 0
    while (i < px.length) {
      acc(0) += (px(i) >> 16) & 0xff
      acc(1) += (px(i) >> 8) & 0xff
      acc(2) += px(i) & 0xff
      i += 1
    }
    acc.map(_ / px.length)
  }

  private val resizeUdf =
    udf { (bytes: Array[Byte], w: Int, h: Int, fmt: String) =>
      resize(bytes, w, h, fmt)
    }
  private val meanRgbUdf = udf { (bytes: Array[Byte]) => meanRgb(bytes) }

  /** Thumbnail column: decode/resize/re-encode every row's payload on
    * the executors, updating (bytes, w, h). Scale: pure per-row map —
    * no shuffle, parallel across all partitions; CPU-bound like any
    * re-encode pipeline, so co-size partitions with cores. */
  def withThumbnail(df: DataFrame, outW: Int, outH: Int): DataFrame =
    df.withColumn("bytes", resizeUdf(col("bytes"), lit(outW), lit(outH), col("fmt")))
      .withColumn("w", lit(outW))
      .withColumn("h", lit(outH))

  /** Feature column: per-row mean RGB vector from a real decode. */
  def withMeanRgb(df: DataFrame, out: String = "mean_rgb"): DataFrame =
    df.withColumn(out, meanRgbUdf(col("bytes")))

  /** PSNR between two payloads' decoded pixels (test/verify helper). */
  def payloadPsnr(a: Array[Byte], b: Array[Byte]): Double = {
    val ia = ImageSynth.decode(a)
    val ref = ia.getRGB(0, 0, ia.getWidth, ia.getHeight, null, 0, ia.getWidth)
    ImageSynth.psnr(ref, ImageSynth.decode(b))
  }
}
