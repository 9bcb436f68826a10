package graft.images

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
import graft.core.{Hashing, UrlUtil}

/** Deterministic image+caption payload synthesis and verification — the
  * input_hint table `(image_id, bytes, w, h, fmt, caption, phash)`.
  * One row per crawlable URL; image_id = the URL fingerprint, so the
  * "fetch" of a URL is an equi-join against this table.
  *
  * Pixels are a smooth deterministic RGB field seeded by murmur3 of the
  * canonical URL; `fmt` alternates png (lossless — exact pixel check) and
  * jpeg q=0.97 (lossy — PSNR ≥ 40 dB check, min ≈40.9 dB over seeds) by host-crc32 parity, which
  * exercises both verification paths of the per-row invariant. */
object ImageSynth {

  // ImageIO's default file-backed stream cache serializes every encode/
  // decode through temp-file IO — with 32 executor threads it inverts
  // scaling. Memory-cached streams keep the codecs CPU-bound.
  javax.imageio.ImageIO.setUseCache(false)

  // codecs are cached per thread: ImageIO.read/write scan the service
  // registry on EVERY call (a shared structure — measurable contention
  // at 32 threads); readers/writers themselves are reusable per thread
  private val jpegWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter](
    () => ImageIO.getImageWritersByFormatName("jpeg").next())
  private val pngWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter](
    () => ImageIO.getImageWritersByFormatName("png").next())
  private val jpegReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](
    () => ImageIO.getImageReadersByFormatName("jpeg").next())
  private val pngReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](
    () => ImageIO.getImageReadersByFormatName("png").next())

  final case class ImageRow(image_id: String, bytes: Array[Byte], w: Int,
      h: Int, fmt: String, caption: String, phash: Long)

  /** Reused per-thread scratch (the fetch+verify stage runs per row on
    * every executor core: fresh 16KB arrays per call put ~100KB/url of
    * allocation churn on the heap, and at 32 cores the resulting GC +
    * memory-bandwidth pressure inverts thread scaling). */
  private final class Scratch {
    var px: Array[Int] = new Array[Int](0)
    var px2: Array[Int] = new Array[Int](0)
    var d1: Array[Double] = new Array[Double](0)
    var d2: Array[Double] = new Array[Double](0)
    var d3: Array[Double] = new Array[Double](0)
    var d4: Array[Double] = new Array[Double](0)
    var img: BufferedImage = null
    val bos = new ByteArrayOutputStream(32 * 1024)
    def buf1(n: Int): Array[Int] = {
      if (px.length < n) px = new Array[Int](n); px
    }
    def buf2(n: Int): Array[Int] = {
      if (px2.length < n) px2 = new Array[Int](n); px2
    }
    def dbuf1(n: Int): Array[Double] = {
      if (d1.length < n) d1 = new Array[Double](n); d1
    }
    def dbuf2(n: Int): Array[Double] = {
      if (d2.length < n) d2 = new Array[Double](n); d2
    }
    def dbuf3(n: Int): Array[Double] = {
      if (d3.length < n) d3 = new Array[Double](n); d3
    }
    def dbuf4(n: Int): Array[Double] = {
      if (d4.length < n) d4 = new Array[Double](n); d4
    }
    def image(w: Int, h: Int): BufferedImage = {
      if (img == null || img.getWidth != w || img.getHeight != h)
        img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img
    }
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  def seedOf(url: String): Long =
    Hashing.murmur128(UrlUtil.canonicalize(url).getBytes("UTF-8"), 42)._1

  /** Smooth pseudo-random RGB pixel field (JPEG-friendly: low-frequency,
    * so q=0.97 stays above 40 dB PSNR). */
  def pixels(url: String, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    pixelsInto(url, w, h, out)
    out
  }

  private def pixelsInto(url: String, w: Int, h: Int, px: Array[Int]): Unit = {
    val seed = seedOf(url)
    // low spatial frequency (≤2 periods across the image) keeps q=0.95
    // JPEG comfortably above the 40 dB bar on every seed
    val fr = 2.0 * math.Pi * (1 + ((seed >>> 8) & 1))
    val p0 = (seed & 0xff).toDouble / 255.0
    val p1 = ((seed >>> 16) & 0xff).toDouble / 255.0
    val p2 = ((seed >>> 32) & 0xff).toDouble / 255.0
    // Every channel's argument is f(x) + g(y), so the trig separates by
    // the angle-addition identities: 6·(w+h) sin/cos evaluations per
    // image instead of 3·w·h — the fetch+verify hot path synthesizes
    // this field TWICE per URL, and the transcendental calls were ~30%
    // of the kernel (guide §1.2 "per-task work"). Pixel values can
    // differ from the direct formula only by FP rounding in the last
    // bit (≤1 int step at sin≈0 crossings); both sides of the payload
    // invariant (rowFor and verifyRow) share this function, and nothing
    // pins the absolute pixels — only round-trip consistency and the
    // ≥40 dB JPEG margin, which a ±1 pixel step cannot dent.
    val s = scratch.get()
    val xa = s.dbuf1(4 * w) // [sinA, cosA, sinU, cosU] per x, interleaved
    val ya = s.dbuf2(4 * h) // [sinV, cosV, sinB, cosB] per y, interleaved
    var x = 0
    while (x < w) {
      val u = x.toDouble / w
      val a = fr * (u + p0)       // r-channel x-part
      xa(4 * x) = math.sin(a)
      xa(4 * x + 1) = math.cos(a)
      xa(4 * x + 2) = math.sin(u) // g-channel x-part
      xa(4 * x + 3) = math.cos(u)
      x += 1
    }
    var y = 0
    while (y < h) {
      val v = y.toDouble / h
      val b = fr * (v + p1)       // g-channel y-part
      ya(4 * y) = math.sin(v)
      ya(4 * y + 1) = math.cos(v)
      ya(4 * y + 2) = math.sin(b)
      ya(4 * y + 3) = math.cos(b)
      y += 1
    }
    // b-channel: cos(fr*((u+v)/2 + p2)) = cos(fr*u/2 + fr*(v/2+p2))
    val bx = s.dbuf3(2 * w)
    val by = s.dbuf4(2 * h)
    x = 0
    while (x < w) {
      val a = fr * (x.toDouble / w) / 2
      bx(2 * x) = math.sin(a)
      bx(2 * x + 1) = math.cos(a)
      x += 1
    }
    y = 0
    while (y < h) {
      val b = fr * ((y.toDouble / h) / 2 + p2)
      by(2 * y) = math.sin(b)
      by(2 * y + 1) = math.cos(b)
      y += 1
    }
    y = 0
    while (y < h) {
      val sinV = ya(4 * y); val cosV = ya(4 * y + 1)
      val sinB = ya(4 * y + 2); val cosB = ya(4 * y + 3)
      val sinBy = by(2 * y); val cosBy = by(2 * y + 1)
      var i = y * w
      x = 0
      while (x < w) {
        // sin(A + v) = sinA·cosV + cosA·sinV
        val r = (127.5 * (1 + (xa(4 * x) * cosV + xa(4 * x + 1) * sinV))).toInt
        // sin(B + u) = sinB·cosU + cosB·sinU
        val g = (127.5 * (1 + (sinB * xa(4 * x + 3) + cosB * xa(4 * x + 2)))).toInt
        // cos(Ax + By) = cosAx·cosBy − sinAx·sinBy
        val b = (127.5 * (1 + (bx(2 * x + 1) * cosBy - bx(2 * x) * sinBy))).toInt
        px(i) = (r << 16) | (g << 8) | b
        x += 1
        i += 1
      }
      y += 1
    }
  }

  private def toImage(px: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = scratch.get().image(w, h)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val writer = pngWriterTL.get()
    val out = scratch.get().bos
    out.reset()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(toImage(px, w, h), null, null), null)
    ios.close()
    out.toByteArray
  }

  def encodeJpeg(px: Array[Int], w: Int, h: Int, quality: Float = 0.97f): Array[Byte] = {
    val writer = jpegWriterTL.get()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = scratch.get().bos
    out.reset()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(toImage(px, w, h), null, null), param)
    ios.close()
    out.toByteArray
  }

  /** 64-bit average-hash over an 8×8 grayscale downsample of the pixel
    * field — the `phash` column (perceptual-hash-like, stable per URL). */
  def phash(px: Array[Int], w: Int, h: Int): Long = {
    val gray = new Array[Double](64)
    var i = 0
    while (i < 64) {
      val gx = i % 8
      val gy = i / 8
      // average the cell
      var sum = 0.0
      var n = 0
      var y = gy * h / 8
      while (y < (gy + 1) * h / 8) {
        var x = gx * w / 8
        while (x < (gx + 1) * w / 8) {
          val p = px(y * w + x)
          sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
          n += 1
          x += 1
        }
        y += 1
      }
      gray(i) = if (n > 0) sum / n else 0.0
      i += 1
    }
    val mean = gray.sum / 64
    var bits = 0L
    i = 0
    while (i < 64) {
      if (gray(i) >= mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  def caption(url: String, depth: Int): String = {
    val host = UrlUtil.slotKey(url)
    val path = UrlUtil.urlparse(url).path
    f"$host page $path depth $depth :: ${seedOf(url)}%016x"
  }

  /** Synthesize the full row for a URL. */
  def rowFor(url: String, depth: Int, w: Int = 64, h: Int = 64): ImageRow = {
    val px = scratch.get().buf1(w * h)
    pixelsInto(url, w, h, px)
    val host = UrlUtil.slotKey(url)
    val isPng = (Hashing.signedCrc32(host) & 1) == 0
    val bytes = if (isPng) encodePng(px, w, h) else encodeJpeg(px, w, h)
    ImageRow(Hashing.urlFingerprint(url), bytes, w, h,
      if (isPng) "png" else "jpeg", caption(url, depth), phash(px, w, h))
  }

  // ---- verification (the per-row invariant of the north rule) ----

  def decode(bytes: Array[Byte]): BufferedImage = {
    // sniff the magic bytes instead of a per-call registry scan
    val isPng = bytes.length > 1 && (bytes(0) & 0xff) == 0x89
    val reader = (if (isPng) pngReaderTL else jpegReaderTL).get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  /** PSNR between reference pixels and a decoded image, in dB. */
  def psnr(ref: Array[Int], img: BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    val got = img.getRGB(0, 0, w, h, scratch.get().buf2(w * h), 0, w)
    val n = w * h // ref may be an oversized reused buffer
    var mse = 0.0
    var i = 0
    while (i < n) {
      var c = 0
      while (c < 3) {
        val d = (((ref(i) >> (8 * c)) & 0xff) - ((got(i) >> (8 * c)) & 0xff)).toDouble
        mse += d * d
        c += 1
      }
      i += 1
    }
    mse /= (n * 3)
    if (mse == 0) Double.PositiveInfinity
    else 10 * math.log10(255.0 * 255.0 / mse)
  }

  /** The invariant: lossless ⇒ exact pixels; lossy ⇒ PSNR ≥ 40 dB;
    * caption must match exactly. */
  def verifyRow(url: String, depth: Int, row: ImageRow): Boolean = {
    val ref = scratch.get().buf1(row.w * row.h)
    pixelsInto(url, row.w, row.h, ref)
    val img = decode(row.bytes)
    val pixelOk =
      if (row.fmt == "png") psnr(ref, img).isPosInfinity
      else psnr(ref, img) >= 40.0
    pixelOk && row.caption == caption(url, depth)
  }
}
