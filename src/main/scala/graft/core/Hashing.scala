package graft.core

import java.security.MessageDigest

/** Row-identity and partitioning hashes of the frontier.
  *
  * The reference keys the whole system off these (frontera/utils/
  * fingerprint.py:10-36, utils/misc.py:48-61, contrib/backends/
  * partitioners.py:9-34). Golden vectors live in tests/test_fingerprint.py
  * and tests/test_partitioners.py and are replayed by HashingSpec.
  */
object Hashing {

  private def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** sha1 hex of UTF-8 bytes (fingerprint.py:10-11). */
  def sha1Hex(key: String): String =
    hex(MessageDigest.getInstance("SHA-1").digest(key.getBytes("UTF-8")))

  /** md5 hex of UTF-8 bytes (fingerprint.py:14-15). */
  def md5Hex(key: String): String =
    hex(MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8")))

  /** URL fingerprint = sha1 of the canonicalized URL
    * (contrib/middlewares/fingerprint.py:75-82). */
  def urlFingerprint(url: String): String = sha1Hex(UrlUtil.canonicalize(url))

  /** Signed 32-bit CRC32 of UTF-8 bytes (utils/misc.py:48-61): python 2
    * compatibility range [-2^31, 2^31-1]. */
  def signedCrc32(key: String): Int = {
    val crc = new java.util.zip.CRC32
    crc.update(key.getBytes("UTF-8"))
    crc.getValue.toInt // low 32 bits reinterpreted as signed == to_signed32
  }

  /** Python `%`: result takes the sign of the divisor (here: non-negative). */
  def pyMod(value: Long, size: Int): Int = {
    val m = (value % size).toInt
    if (m < 0) m + size else m
  }

  /** Crc32NamePartitioner (partitioners.py:9-23): signed crc32 of the
    * hostname, python-mod over the partition count. */
  def crc32Partition(key: String, partitions: Int): Int =
    pyMod(signedCrc32(key).toLong, partitions)

  /** FingerprintPartitioner (partitioners.py:25-34): CityHash64 mod n.
    * CityHash64 is unsigned; python-mod == unsigned mod. */
  def fingerprintPartition(key: String, partitions: Int): Int =
    pyMod(java.lang.Long.remainderUnsigned(CityHash.cityHash64(key.getBytes("UTF-8")), partitions),
      partitions)

  /** hostname_local_fingerprint (fingerprint.py:18-36): 4-byte big-endian
    * signed crc32(host) ++ md5(host+path+';'+params+query+fragment), hex. */
  def hostnameLocalFingerprint(url: String): String = {
    val p = UrlUtil.urlparse(url)
    val hostname = p.hostname.getOrElse("-")
    val hostChecksum = signedCrc32(hostname)
    val combined = hostname + p.path + ";" + p.params + p.query + p.fragment
    val md5raw = MessageDigest.getInstance("MD5").digest(combined.getBytes("UTF-8"))
    val out = new Array[Byte](20)
    out(0) = ((hostChecksum >> 24) & 0xff).toByte
    out(1) = ((hostChecksum >> 16) & 0xff).toByte
    out(2) = ((hostChecksum >> 8) & 0xff).toByte
    out(3) = (hostChecksum & 0xff).toByte
    System.arraycopy(md5raw, 0, out, 4, 16)
    hex(out)
  }

  /** MurmurHash3 x64 128-bit of the canonicalized URL — the URL-seen /
    * Bloom key mandated by the engine's design (dedup-filter key; the
    * sha1 fingerprint stays the reference-conformant row identity).
    * Returns the low 64 bits (h1); murmur128 returns both halves. */
  def seenKey(url: String): Long =
    murmur128(UrlUtil.canonicalize(url).getBytes("UTF-8"), 0)._1

  /** Public-domain MurmurHash3 x64_128 (Austin Appleby). */
  def murmur128(data: Array[Byte], seed: Int): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    val len = data.length
    val nblocks = len / 16
    var h1 = seed & 0xffffffffL
    var h2 = seed & 0xffffffffL

    def getLong(i: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (data(i + j) & 0xffL); j -= 1 }
      v
    }
    var i = 0
    while (i < nblocks) {
      var k1 = getLong(i * 16)
      var k2 = getLong(i * 16 + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var j = rem - 1
      while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= len; h2 ^= len
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }
}

/** Public-domain CityHash v1.1 64-bit (Google; used by the reference's
  * FingerprintPartitioner via the `cityhash` pypi package). Only the
  * 64-bit no-seed variant is needed. */
object CityHash {
  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL

  private def fetch64(s: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 7
    while (j >= 0) { v = (v << 8) | (s(i + j) & 0xffL); j -= 1 }
    v
  }
  private def fetch32(s: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 3
    while (j >= 0) { v = (v << 8) | (s(i + j) & 0xffL); j -= 1 }
    v
  }
  private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))
  private def shiftMix(v: Long): Long = v ^ (v >>> 47)
  private def bswap64(v: Long): Long = java.lang.Long.reverseBytes(v)

  private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= (a >>> 47)
    var b = (v ^ a) * mul
    b ^= (b >>> 47)
    b *= mul
    b
  }
  private def hashLen16(u: Long, v: Long): Long =
    hashLen16(u, v, 0x9ddfea08eb382d69L)

  private def hashLen0to16(s: Array[Byte], pos: Int, len: Int): Long = {
    if (len >= 8) {
      val mul = k2 + len * 2L
      val a = fetch64(s, pos) + k2
      val b = fetch64(s, pos + len - 8)
      val c = rotate(b, 37) * mul + a
      val d = (rotate(a, 25) + b) * mul
      hashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = k2 + len * 2L
      val a = fetch32(s, pos)
      hashLen16(len + (a << 3), fetch32(s, pos + len - 4), mul)
    } else if (len > 0) {
      val a = s(pos) & 0xffL
      val b = s(pos + (len >> 1)) & 0xffL
      val c = s(pos + len - 1) & 0xffL
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * k2 ^ z * k0) * k2
    } else k2
  }

  private def hashLen17to32(s: Array[Byte], pos: Int, len: Int): Long = {
    val mul = k2 + len * 2L
    val a = fetch64(s, pos) * k1
    val b = fetch64(s, pos + 8)
    val c = fetch64(s, pos + len - 8) * mul
    val d = fetch64(s, pos + len - 16) * k2
    hashLen16(rotate(a + b, 43) + rotate(c, 30) + d,
      a + rotate(b + k2, 18) + c, mul)
  }

  private def hashLen33to64(s: Array[Byte], pos: Int, len: Int): Long = {
    val mul = k2 + len * 2L
    var a = fetch64(s, pos) * k2
    var b = fetch64(s, pos + 8)
    val c = fetch64(s, pos + len - 24)
    val d = fetch64(s, pos + len - 32)
    val e = fetch64(s, pos + 16) * k2
    val f = fetch64(s, pos + 24) * 9L
    val g = fetch64(s, pos + len - 8)
    val h = fetch64(s, pos + len - 16) * mul
    val u = rotate(a + g, 43) + (rotate(b, 30) + c) * 9L
    val v = ((a + g) ^ d) + f + 1L
    val w = bswap64((u + v) * mul) + h
    val x = rotate(e + f, 42) + c
    val y = (bswap64((v + w) * mul) + g) * mul
    val z = e + f + c
    a = bswap64((x + z) * mul + y) + b
    b = shiftMix((z + a) * mul + d + h) * mul
    b + x
  }

  private def weakHashLen32WithSeeds(w: Long, x: Long, y: Long, z: Long,
      a0: Long, b0: Long): (Long, Long) = {
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }
  private def weakHashLen32WithSeeds(s: Array[Byte], pos: Int, a: Long,
      b: Long): (Long, Long) =
    weakHashLen32WithSeeds(fetch64(s, pos), fetch64(s, pos + 8),
      fetch64(s, pos + 16), fetch64(s, pos + 24), a, b)

  def cityHash64(s: Array[Byte]): Long = cityHash64(s, 0, s.length)

  def cityHash64(s: Array[Byte], pos0: Int, len0: Int): Long = {
    var pos = pos0
    var len = len0
    if (len <= 32) {
      if (len <= 16) return hashLen0to16(s, pos, len)
      else return hashLen17to32(s, pos, len)
    } else if (len <= 64) {
      return hashLen33to64(s, pos, len)
    }
    var x = fetch64(s, pos + len - 40)
    var y = fetch64(s, pos + len - 16) + fetch64(s, pos + len - 56)
    var z = hashLen16(fetch64(s, pos + len - 48) + len,
      fetch64(s, pos + len - 24))
    var v = weakHashLen32WithSeeds(s, pos + len - 64, len, z)
    var w = weakHashLen32WithSeeds(s, pos + len - 32, y + k1, x)
    x = x * k1 + fetch64(s, pos)
    len = (len - 1) & ~63
    while (len > 0) {
      x = rotate(x + y + v._1 + fetch64(s, pos + 8), 37) * k1
      y = rotate(y + v._2 + fetch64(s, pos + 48), 42) * k1
      x ^= w._2
      y += v._1 + fetch64(s, pos + 40)
      z = rotate(z + w._1, 33) * k1
      v = weakHashLen32WithSeeds(s, pos, v._2 * k1, x + w._1)
      w = weakHashLen32WithSeeds(s, pos + 32, z + w._2,
        y + fetch64(s, pos + 16))
      val t = z; z = x; x = t
      pos += 64
      len -= 64
    }
    hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * k1 + z,
      hashLen16(v._2, w._2) + x)
  }
}
