package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the full-PSL registrable-domain lookup behind
  * `UrlUtil.sld` (reference `_get_2ndlevel_name`,
  * discovery/__init__.py:520-523). Every vector is hand-derived from a
  * named rule in the shipped public_suffix_list.dat (rule cited inline)
  * plus the publicsuffix.org matching algorithm. */
class PublicSuffixSpec extends AnyFunSuite {

  test("two-part ICANN suffixes: co.uk / com.au / co.jp") {
    assert(UrlUtil.sld("www.example.co.uk") == "example.co.uk") // rule co.uk
    assert(UrlUtil.sld("example.co.uk") == "example.co.uk")
    assert(UrlUtil.sld("a.b.shop.example.com.au") == "example.com.au") // com.au
    assert(UrlUtil.sld("foo.co.jp") == "foo.co.jp") // co.jp
    assert(UrlUtil.sld("a.b.foo.co.jp") == "foo.co.jp")
  }

  test("multi-part exotic suffix: pvt.k12.ma.us (4-label registrable)") {
    assert(UrlUtil.sld("school.pvt.k12.ma.us") == "school.pvt.k12.ma.us")
    assert(UrlUtil.sld("www.school.pvt.k12.ma.us") == "school.pvt.k12.ma.us")
  }

  test("wildcard rules: *.ck and *.kawasaki.jp") {
    // *.ck: every label under ck is itself a suffix
    assert(UrlUtil.sld("a.b.ck") == "a.b.ck")
    assert(UrlUtil.sld("x.a.b.ck") == "a.b.ck")
    // *.kawasaki.jp beats the plain jp/co.jp rules (longest match)
    assert(UrlUtil.sld("a.foo.kawasaki.jp") == "a.foo.kawasaki.jp")
    assert(UrlUtil.sld("b.a.foo.kawasaki.jp") == "a.foo.kawasaki.jp")
  }

  test("exception rules: !www.ck and !city.kawasaki.jp beat their wildcards") {
    assert(UrlUtil.sld("www.ck") == "www.ck")
    assert(UrlUtil.sld("foo.www.ck") == "www.ck")
    assert(UrlUtil.sld("foo.city.kawasaki.jp") == "city.kawasaki.jp")
  }

  test("private-section rules count too (github.io)") {
    assert(UrlUtil.sld("user.github.io") == "user.github.io")
    assert(UrlUtil.sld("www.user.github.io") == "user.github.io")
  }

  test("implicit-* default: unknown TLD keeps last two labels " +
       "(spec rule; preserves the engine's synthetic-host fixtures)") {
    assert(UrlUtil.sld("host0.example") == "host0.example")
    assert(UrlUtil.sld("a.host0.example") == "host0.example")
    assert(UrlUtil.sld("test.cloud.c.com") == "c.com") // F5 fixture, unchanged
  }

  test("normalization + degenerate hosts") {
    assert(UrlUtil.sld("WWW.Example.CO.UK.") == "example.co.uk")
    assert(UrlUtil.sld("localhost") == "localhost")
    assert(UrlUtil.sld("com") == "com") // a bare suffix is itself
    assert(UrlUtil.sld("") == "")
    // idempotence over every vector family
    for (h <- Seq("www.example.co.uk", "x.a.b.ck", "foo.www.ck",
        "www.school.pvt.k12.ma.us", "www.user.github.io", "a.host0.example"))
      assert(UrlUtil.sld(UrlUtil.sld(h)) == UrlUtil.sld(h))
  }
}
