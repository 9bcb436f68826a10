package graft.codecs

import scala.collection.immutable.ArraySeq

/** Wire value model shared by the S9 codecs (reference
  * `frontera/core/codec.py` message surface, carried by the JSON codec
  * `codecs/json.py` and the msgpack codec `codecs/msgpack.py`).
  *
  * The reference's messages are python structures of: byte strings,
  * unicode strings, ints, floats, bools, None, lists, tuples, and
  * (insertion-ordered) dicts. `CValue` models exactly that — dicts as
  * ordered pair vectors, because both codecs serialize dict ORDER
  * (the JSON codec as a list of pairs, msgpack as a map in insertion
  * order), and the golden vectors pin it. */
sealed trait CValue
object CValue {
  case object CNull extends CValue
  final case class CBool(v: Boolean) extends CValue
  final case class CLong(v: Long) extends CValue
  final case class CDouble(v: Double) extends CValue
  /** a python unicode str */
  final case class CStr(v: String) extends CValue
  /** a python byte string (headers/cookies/meta keys and values; bodies) */
  final case class CBytes(v: ArraySeq[Byte]) extends CValue
  final case class CList(items: Vector[CValue]) extends CValue
  final case class CTuple(items: Vector[CValue]) extends CValue
  final case class CDict(items: Vector[(CValue, CValue)]) extends CValue

  def bytes(s: String): CBytes =
    CBytes(ArraySeq.unsafeWrapArray(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  def bytesUtf8(b: CBytes): String =
    new String(b.v.toArray, java.nio.charset.StandardCharsets.UTF_8)
}

/** The request shape both codecs carry (reference `core/models.py`
  * Request: url, method, headers, cookies, meta — method arrives as a
  * byte string after the model's to_bytes). */
final case class WireRequest(
    url: String,
    method: CValue.CBytes = CValue.bytes("GET"),
    headers: CValue.CDict = CValue.CDict(Vector.empty),
    cookies: CValue.CDict = CValue.CDict(Vector.empty),
    meta: CValue.CDict = CValue.CDict(Vector.empty))

/** The response shape (reference Response: url, status_code, meta from
  * its request, headers, body). The JSON codec serializes
  * (url, status_code, meta, body-b64); msgpack
  * (url, status_code, meta, headers, body-raw). */
final case class WireResponse(
    url: String,
    statusCode: Long,
    meta: CValue.CDict = CValue.CDict(Vector.empty),
    headers: CValue.CDict = CValue.CDict(Vector.empty),
    body: Option[ArraySeq[Byte]] = None)

/** Spider-log / scoring-log message surface (core/codec.py). */
sealed trait BusMessage
object BusMessage {
  final case class PageCrawled(r: WireResponse) extends BusMessage
  final case class LinksExtracted(r: WireRequest, links: Vector[WireRequest]) extends BusMessage
  final case class RequestError(r: WireRequest, error: String) extends BusMessage
  final case class UpdateScore(r: WireRequest, score: Double, schedule: Boolean) extends BusMessage
  final case class NewJobId(jobId: Long) extends BusMessage
  final case class Offset(partitionId: Long, offset: Long) extends BusMessage
  final case class Stats(stats: CValue.CDict) extends BusMessage
}
