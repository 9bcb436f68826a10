package graft.codecs

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ArraySeq
import CValue._
import BusMessage._

/** Msgpack codec (`contrib/backends/remote/codecs/msgpack.py` shapes,
  * `use_bin_type` packing): spec-derived hex goldens (hand-assembled
  * from the public msgpack format spec, independently checkable byte by
  * byte) plus structural round-trips. */
class MsgpackCodecSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def strHex(s: String): String = hex(s.getBytes("UTF-8"))

  test("spec goldens: offset / new_job_id / bare request") {
    // [bin"of", 0, 28796]: fixarray3, bin8 len2 'of', fixint 0, uint16 28796
    assert(hex(MsgpackCodec.encode(Offset(0, 28796))) ==
      "93" + "c402" + strHex("of") + "00" + "cd707c")
    // [bin"njid", 3]
    assert(hex(MsgpackCodec.encode(NewJobId(3))) ==
      "92" + "c404" + strHex("njid") + "03")
    // [str"http://a.com/", bin"GET", {}, {}, {}]
    val req = WireRequest("http://a.com/")
    assert(hex(MsgpackCodec.encodeRequest(req)) ==
      "95" + "ad" + strHex("http://a.com/") +
        "c403" + strHex("GET") + "80" + "80" + "80")
  }

  test("spec goldens: scalar encodings") {
    assert(hex(MsgpackCodec.packValue(CNull)) == "c0")
    assert(hex(MsgpackCodec.packValue(CBool(true))) == "c3")
    assert(hex(MsgpackCodec.packValue(CLong(-1))) == "ff")
    assert(hex(MsgpackCodec.packValue(CLong(-33))) == "d0df")
    assert(hex(MsgpackCodec.packValue(CLong(255))) == "ccff")
    assert(hex(MsgpackCodec.packValue(CLong(1L << 40))) == "cf0000010000000000")
    assert(hex(MsgpackCodec.packValue(CDouble(0.5))) == "cb3fe0000000000000")
    // 32-char string crosses fixstr → str8
    assert(hex(MsgpackCodec.packValue(CStr("a" * 32))) == "d920" + "61" * 32)
  }

  test("round-trip: full message surface incl. binary body and unicode") {
    val req = WireRequest(
      url = "http://www.example.com/päge",
      method = bytes("POST"),
      headers = CDict(Vector(bytes("X-H") -> bytes("v"))),
      cookies = CDict(Vector(bytes("c") -> bytes("1"))),
      meta = CDict(Vector(
        bytes("depth") -> CLong(3),
        bytes("score") -> CDouble(0.25),
        bytes("flags") -> CList(Vector(CBool(true), CNull, CLong(-100000))))))
    val body = ArraySeq.unsafeWrapArray(Array.tabulate(300)(i => (i % 251).toByte))
    val resp = WireResponse("http://www.example.com/päge", 301,
      meta = req.meta, headers = req.headers, body = Some(body))
    val msgs: Seq[BusMessage] = Seq(
      PageCrawled(resp),
      LinksExtracted(req, Vector(req.copy(url = "http://b.com/"), req)),
      RequestError(req, "DNSLookupError: no host"),
      UpdateScore(req, 0.87, schedule = false),
      NewJobId(1L << 33),
      Offset(31, 123456789012L),
      Stats(CDict(Vector(CStr("pages") -> CLong(42)))))
    msgs.foreach {
      case m @ PageCrawled(_) =>
        assert(MsgpackCodec.decode(MsgpackCodec.encode(m, sendBody = true)) == m)
        // without sendBody the body drops to None (reference behavior)
        MsgpackCodec.decode(MsgpackCodec.encode(m)) match {
          case PageCrawled(r) => assert(r.body.isEmpty)
          case other => fail(s"$other")
        }
      case m => assert(MsgpackCodec.decode(MsgpackCodec.encode(m)) == m)
    }
    assert(MsgpackCodec.decodeRequest(MsgpackCodec.encodeRequest(req)) == req)
  }

  test("large collections cross the fixarray/fixmap boundaries") {
    val bigList = CList(Vector.tabulate(300)(i => CLong(i)))
    assert(MsgpackCodec.unpackValue(MsgpackCodec.packValue(bigList)) == bigList)
    val bigMap = CDict(Vector.tabulate(20)(i => (CStr(s"k$i"), CLong(i))))
    assert(MsgpackCodec.unpackValue(MsgpackCodec.packValue(bigMap)) == bigMap)
  }
}
