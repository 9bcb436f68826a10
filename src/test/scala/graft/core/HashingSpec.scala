package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from the reference: tests/test_fingerprint.py:7-42,
  * tests/test_partitioners.py:7-29, tests/test_strategy.py:46-49,
  * tests/contrib/backends/test_backends.py:110-117. */
class HashingSpec extends AnyFunSuite {
  val url1 = "https://news.yandex.ru/yandsearch?cl4url=top.rbc.ru/politics/14/07/2015/55a50b509a79473f583e104c&lang=ru&lr=54#fragment"
  val url2 = "TestString"
  val url3 = "http://www.example.com/some/page倀/"

  test("sha1 golden vectors") {
    assert(Hashing.sha1Hex(url1) == "880c5e7919cb09e182bd639d724bce6d90db71eb")
    assert(Hashing.sha1Hex(url2) == "d598b03bee8866ae03b54cb6912efdfef107fd6d")
    assert(Hashing.sha1Hex(url3) == "28bf812b6421a46ee5bcf40c05a82e8f051ab88e")
  }

  test("md5 golden vectors") {
    assert(Hashing.md5Hex(url1) == "bb82110ce034c1a6ad55a2e73adc322a")
    assert(Hashing.md5Hex(url2) == "5b56f40f8828701f97fa4511ddcd25fb")
    assert(Hashing.md5Hex(url3) == "5abf5c9aa02d870756032bdec0bd6522")
  }

  test("hostname_local_fingerprint golden vectors") {
    assert(Hashing.hostnameLocalFingerprint(url1) == "1be68ff5587d241e22865288133b37d63ab49e13")
    assert(Hashing.hostnameLocalFingerprint(url2) == "97ddb3f898d2460d60d3f4d6cb7dbc5d0b8025f8")
    assert(Hashing.hostnameLocalFingerprint(url3) == "2ed642bb1e215e68ef283a1939252734e84c3c76")
  }

  test("canonicalize + sha1 (tests/test_strategy.py:46-49)") {
    assert(Hashing.urlFingerprint("http://test.com/someurl") ==
      "955ac04f1b1a96de60a5139ad90c80be87822159")
  }

  test("FingerprintPartitioner golden vector (CityHash64 mod 5 == 2)") {
    assert(Hashing.fingerprintPartition("1be68ff556fd0bbe5802d1a100850da29f7f15b1", 5) == 2)
  }

  test("Crc32NamePartitioner golden vector (mod 5 == 3)") {
    assert(Hashing.crc32Partition("1be68ff556fd0bbe5802d1a100850da29f7f15b11", 5) == 3)
  }

  test("queue partitioning vector (test_backends.py:110-117)") {
    assert(Hashing.crc32Partition("www.scrapy.org", 2) == 0)
    assert(Hashing.crc32Partition("www.example.com", 2) == 1)
    assert(Hashing.crc32Partition("example.com", 2) == 1)
  }

  test("canonicalize: sorted query, dropped fragment, default path") {
    assert(UrlUtil.canonicalize("http://test.com") == "http://test.com/")
    assert(UrlUtil.canonicalize("http://Test.COM/b?z=1&a=2#frag") ==
      "http://test.com/b?a=2&z=1")
    // idempotence
    val c = UrlUtil.canonicalize(url1)
    assert(UrlUtil.canonicalize(c) == c)
  }

  test("unquotePath preserves protected-escape case (w3lib _unquotepath)") {
    // w3lib protects %2f/%3f with '%25' + the ORIGINAL hex digits, so the
    // case of the escape survives canonicalization and the fingerprint
    // matches the reference for lowercase escapes too
    assert(UrlUtil.canonicalize("http://a.com/x%2fy") == "http://a.com/x%2fy")
    assert(UrlUtil.canonicalize("http://a.com/x%2Fy") == "http://a.com/x%2Fy")
    assert(UrlUtil.canonicalize("http://a.com/x%3fy") == "http://a.com/x%3fy")
    assert(UrlUtil.canonicalize("http://a.com/x%3Fy%20z") == "http://a.com/x%3Fy%20z")
  }

  test("urlparse basics match CPython tokenization") {
    val p = UrlUtil.urlparse(url1)
    assert(p.scheme == "https")
    assert(p.hostname.contains("news.yandex.ru"))
    assert(p.path == "/yandsearch")
    assert(p.fragment == "fragment")
    assert(UrlUtil.urlparse("TestString").hostname.isEmpty)
    assert(UrlUtil.slotKey("http://b.com/entries?page=2") == "b.com")
    assert(UrlUtil.slotKey("http://User@WWW.A.com:8080/x") == "www.a.com")
  }

  test("get_slot_key ip mode: injected resolver, hostname fallthrough, stable stub") {
    // injected resolver result becomes the slot key
    assert(UrlUtil.slotKeyIp("http://a.com/x", _ => "93.184.216.34") == "93.184.216.34")
    // resolver failure keeps the hostname key (the reference's behavior
    // when getaddrinfo yields nothing usable)
    assert(UrlUtil.slotKeyIp("http://a.com/x",
      _ => throw new RuntimeException("nxdomain")) == "a.com")
    // the offline stub is deterministic and IPv4-shaped
    val ip = UrlUtil.fakeResolver("a.com")
    assert(ip == UrlUtil.fakeResolver("a.com"))
    assert(ip.matches("10\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"))
    assert(UrlUtil.slotKeyIp("http://a.com/x", UrlUtil.fakeResolver) == ip)
    // two hosts resolving to one IP collapse into one politeness slot
    assert(UrlUtil.slotKeyIp("http://x1.com/", _ => "1.2.3.4") ==
      UrlUtil.slotKeyIp("http://x2.com/", _ => "1.2.3.4"))
  }
}
