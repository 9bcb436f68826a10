package graft.codecs

import scala.collection.immutable.ArraySeq
import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import CValue._

/** S9: the reference's msgpack bus codec
  * (`contrib/backends/remote/codecs/msgpack.py`), implemented against
  * the public msgpack specification with `use_bin_type` semantics
  * (unicode str → str family, byte strings/bodies → bin family) — no
  * third-party library, like everything else in this engine.
  *
  * Message shapes (msgpack.py:20-48): requests serialize as POSITIONAL
  * arrays `[url, method, headers, cookies, meta]`, responses as
  * `[url, status_code, meta, headers, body|nil]` (the msgpack response
  * carries headers where the JSON one does not), and each message is
  * `[tag, ...]` with a byte-string tag (`pc`/`le`/`re`/`us`/`njid`/
  * `of`/`st`). MsgpackCodecSpec pins spec-derived hex goldens plus
  * round-trips. */
object MsgpackCodec {

  // ------------------------------------------------------------------ pack

  private def packInto(v: CValue, o: DataOutputStream): Unit = v match {
    case CNull => o.writeByte(0xc0)
    case CBool(false) => o.writeByte(0xc2)
    case CBool(true) => o.writeByte(0xc3)
    case CLong(n) => packLong(n, o)
    case CDouble(d) => o.writeByte(0xcb); o.writeDouble(d)
    case CStr(s) =>
      val b = s.getBytes(UTF_8)
      if (b.length < 32) o.writeByte(0xa0 | b.length)
      else if (b.length < 256) { o.writeByte(0xd9); o.writeByte(b.length) }
      else if (b.length < 65536) { o.writeByte(0xda); o.writeShort(b.length) }
      else { o.writeByte(0xdb); o.writeInt(b.length) }
      o.write(b)
    case CBytes(b) =>
      if (b.length < 256) { o.writeByte(0xc4); o.writeByte(b.length) }
      else if (b.length < 65536) { o.writeByte(0xc5); o.writeShort(b.length) }
      else { o.writeByte(0xc6); o.writeInt(b.length) }
      o.write(b.toArray)
    case CList(items) => packArray(items, o)
    case CTuple(items) => packArray(items, o)
    case CDict(items) =>
      if (items.length < 16) o.writeByte(0x80 | items.length)
      else if (items.length < 65536) { o.writeByte(0xde); o.writeShort(items.length) }
      else { o.writeByte(0xdf); o.writeInt(items.length) }
      items.foreach { case (k, vv) => packInto(k, o); packInto(vv, o) }
  }

  private def packArray(items: Vector[CValue], o: DataOutputStream): Unit = {
    if (items.length < 16) o.writeByte(0x90 | items.length)
    else if (items.length < 65536) { o.writeByte(0xdc); o.writeShort(items.length) }
    else { o.writeByte(0xdd); o.writeInt(items.length) }
    items.foreach(packInto(_, o))
  }

  private def packLong(n: Long, o: DataOutputStream): Unit =
    if (n >= 0) {
      if (n < 128) o.writeByte(n.toInt)
      else if (n < 256) { o.writeByte(0xcc); o.writeByte(n.toInt) }
      else if (n < 65536) { o.writeByte(0xcd); o.writeShort(n.toInt) }
      else if (n < (1L << 32)) { o.writeByte(0xce); o.writeInt(n.toInt) }
      else { o.writeByte(0xcf); o.writeLong(n) }
    } else {
      if (n >= -32) o.writeByte(0xe0 | (n & 0x1f).toInt)
      else if (n >= Byte.MinValue) { o.writeByte(0xd0); o.writeByte(n.toInt) }
      else if (n >= Short.MinValue) { o.writeByte(0xd1); o.writeShort(n.toInt) }
      else if (n >= Int.MinValue) { o.writeByte(0xd2); o.writeInt(n.toInt) }
      else { o.writeByte(0xd3); o.writeLong(n) }
    }

  def packValue(v: CValue): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    packInto(v, new DataOutputStream(bos))
    bos.toByteArray
  }

  /** Envelope tag of a bus frame (`pc`/`le`/`re`/`us`/`njid`/`of`/`st`)
    * without decoding the payload — reads only the array header and the
    * short bin/str tag element. "" if the frame isn't message-shaped. */
  def peekTag(buf: Array[Byte]): String = {
    if (buf.length < 3) return ""
    var i = 0
    val h = buf(i) & 0xff; i += 1
    if ((h & 0xf0) == 0x90) () // fixarray
    else if (h == 0xdc) i += 2
    else if (h == 0xdd) i += 4
    else return ""
    if (i >= buf.length) return ""
    val t = buf(i) & 0xff; i += 1
    val len =
      if (t == 0xc4 || t == 0xd9) { // bin8 / str8
        if (i >= buf.length) return ""
        val l = buf(i) & 0xff; i += 1; l
      } else if ((t & 0xe0) == 0xa0) t & 0x1f // fixstr
      else return ""
    if (i + len > buf.length) "" else new String(buf, i, len, UTF_8)
  }

  // ---------------------------------------------------------------- unpack

  private final class U(b: Array[Byte]) {
    private var i = 0
    private def u8(): Int = { val x = b(i) & 0xff; i += 1; x }
    private def u16(): Int = (u8() << 8) | u8()
    private def u32(): Long = ((u16().toLong << 16) | u16()) & 0xffffffffL
    private def u64(): Long = (u32() << 32) | u32()
    private def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(b, i, i + n); i += n; a
    }
    def unpack(): CValue = {
      val t = u8()
      if (t < 0x80) CLong(t)
      else if (t >= 0xe0) CLong((t - 256).toLong)
      else if ((t & 0xf0) == 0x80) dict(t & 0x0f)
      else if ((t & 0xf0) == 0x90) array(t & 0x0f)
      else if ((t & 0xe0) == 0xa0) CStr(new String(take(t & 0x1f), UTF_8))
      else t match {
        case 0xc0 => CNull
        case 0xc2 => CBool(false)
        case 0xc3 => CBool(true)
        case 0xc4 => CBytes(ArraySeq.unsafeWrapArray(take(u8())))
        case 0xc5 => CBytes(ArraySeq.unsafeWrapArray(take(u16())))
        case 0xc6 => CBytes(ArraySeq.unsafeWrapArray(take(u32().toInt)))
        case 0xcb => CDouble(java.lang.Double.longBitsToDouble(u64()))
        case 0xca => CDouble(java.lang.Float.intBitsToFloat(u32().toInt).toDouble)
        case 0xcc => CLong(u8())
        case 0xcd => CLong(u16())
        case 0xce => CLong(u32())
        case 0xcf => CLong(u64()) // values > Long.MaxValue wrap, like unpackb into int64 consumers
        case 0xd0 => CLong(u8().toByte)
        case 0xd1 => CLong(u16().toShort)
        case 0xd2 => CLong(u32().toInt)
        case 0xd3 => CLong(u64())
        case 0xd9 => CStr(new String(take(u8()), UTF_8))
        case 0xda => CStr(new String(take(u16()), UTF_8))
        case 0xdb => CStr(new String(take(u32().toInt), UTF_8))
        case 0xdc => array(u16())
        case 0xdd => array(u32().toInt)
        case 0xde => dict(u16())
        case 0xdf => dict(u32().toInt)
        case x => sys.error(f"unsupported msgpack type 0x$x%02x")
      }
    }
    private def array(n: Int): CList =
      CList(Vector.fill(n)(unpack()))
    private def dict(n: Int): CDict =
      CDict(Vector.fill(n)((unpack(), unpack())))
  }

  def unpackValue(b: Array[Byte]): CValue = new U(b).unpack()

  // -------------------------------------------------------------- messages

  private def requestArr(r: WireRequest): CList = CList(Vector(
    CStr(r.url), r.method, r.headers, r.cookies, r.meta))

  private def responseArr(r: WireResponse, sendBody: Boolean): CList = CList(Vector(
    CStr(r.url), CLong(r.statusCode), r.meta, r.headers,
    r.body.filter(_ => sendBody).map(CBytes(_)).getOrElse(CNull)))

  def encodeRequest(r: WireRequest): Array[Byte] = packValue(requestArr(r))

  def encode(msg: BusMessage, sendBody: Boolean = false): Array[Byte] = {
    import BusMessage._
    val v = msg match {
      case PageCrawled(r) => CList(Vector(bytes("pc"), responseArr(r, sendBody)))
      case LinksExtracted(r, links) => CList(Vector(
        bytes("le"), requestArr(r), CList(links.map(requestArr))))
      case RequestError(r, e) => CList(Vector(bytes("re"), requestArr(r), CStr(e)))
      case UpdateScore(r, score, schedule) => CList(Vector(
        bytes("us"), requestArr(r), CDouble(score), CBool(schedule)))
      case NewJobId(j) => CList(Vector(bytes("njid"), CLong(j)))
      case Offset(p, o) => CList(Vector(bytes("of"), CLong(p), CLong(o)))
      case Stats(s) => CList(Vector(bytes("st"), s))
    }
    packValue(v)
  }

  private def requestFrom(v: CValue): WireRequest = {
    val a = v.asInstanceOf[CList].items
    WireRequest(
      url = a(0) match {
        case CStr(s) => s
        case b: CBytes => bytesUtf8(b)
        case x => sys.error(s"bad url $x")
      },
      method = a(1) match {
        case b: CBytes => b
        case CStr(s) => bytes(s)
        case _ => bytes("GET")
      },
      headers = a(2).asInstanceOf[CDict],
      cookies = a(3).asInstanceOf[CDict],
      meta = a(4).asInstanceOf[CDict])
  }

  def decode(buf: Array[Byte]): BusMessage = {
    import BusMessage._
    val a = unpackValue(buf).asInstanceOf[CList].items
    val tag = a(0) match {
      case b: CBytes => bytesUtf8(b)
      case CStr(s) => s
      case x => sys.error(s"bad tag $x")
    }
    tag match {
      case "pc" =>
        val r = a(1).asInstanceOf[CList].items
        PageCrawled(WireResponse(
          url = r(0) match { case CStr(s) => s; case b: CBytes => bytesUtf8(b); case x => sys.error(s"$x") },
          statusCode = r(1).asInstanceOf[CLong].v,
          meta = r(2).asInstanceOf[CDict],
          headers = r(3).asInstanceOf[CDict],
          body = r(4) match { case CNull => None; case b: CBytes => Some(b.v); case x => sys.error(s"$x") }))
      case "le" => LinksExtracted(
        requestFrom(a(1)), a(2).asInstanceOf[CList].items.map(requestFrom))
      case "re" => RequestError(requestFrom(a(1)),
        a(2) match { case CStr(s) => s; case b: CBytes => bytesUtf8(b); case x => sys.error(s"$x") })
      case "us" => UpdateScore(requestFrom(a(1)),
        a(2) match { case CDouble(d) => d; case CLong(n) => n.toDouble; case x => sys.error(s"$x") },
        a(3).asInstanceOf[CBool].v)
      case "njid" => NewJobId(a(1).asInstanceOf[CLong].v)
      case "of" => Offset(a(1).asInstanceOf[CLong].v, a(2).asInstanceOf[CLong].v)
      case "st" => Stats(a(1).asInstanceOf[CDict])
      case t => sys.error(s"unknown tag $t")
    }
  }

  def decodeRequest(buf: Array[Byte]): WireRequest = requestFrom(unpackValue(buf))
}
