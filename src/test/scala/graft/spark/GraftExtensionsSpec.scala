package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Hashing, UrlUtil}

/** The SparkSessionExtensions surface: every frontier kernel is callable
  * from plain SQL (registered by [[GraftExtensions]], which
  * SparkTestBase wires the way `--conf spark.sql.extensions=graft.spark
  * .GraftExtensions` would at deploy time) and agrees with the
  * graft.core reference implementations the column API is pinned to. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def one[T](sql: String): T =
    spark.sql(sql).collect()(0).getAs[T](0)

  test("all frontier functions are registered in the SQL function registry") {
    for ((ident, _, _) <- GraftExtensions.descriptions)
      assert(spark.catalog.functionExists(ident.funcName), ident.funcName)
  }

  test("SQL results agree with the graft.core kernels") {
    val url = "http://www.Example.COM:80/a/../b?q=1#frag"
    assert(one[String](s"SELECT graft_canonicalize_url('$url')") ===
      UrlUtil.canonicalize(url))
    assert(one[String](s"SELECT graft_url_fingerprint('$url')") ===
      Hashing.urlFingerprint(url))
    assert(one[String](s"SELECT graft_url_host('$url')") ===
      UrlUtil.slotKey(url))
    assert(one[String]("SELECT graft_sld('a.b.co.uk')") === "b.co.uk")
    assert(one[Boolean]("SELECT graft_is_home_page('http://x.com/')") === true)
    assert(one[Boolean]("SELECT graft_is_home_page('http://x.com/a/b')") === false)
    assert(one[Int]("SELECT graft_signed_crc32('www.example.com')") ===
      Hashing.signedCrc32("www.example.com"))
    assert(one[Long]("SELECT graft_seen_key('http://x.com/p')") ===
      Hashing.seenKey("http://x.com/p"))
    assert(one[Int]("SELECT graft_host_partition('www.example.com', 8)") ===
      Hashing.crc32Partition("www.example.com", 8))
    val body = "User-agent: *\\nDisallow: /private\\n"
    assert(one[Boolean](
      s"SELECT graft_robots_can_fetch('http://x.com/ok', '$body')") === true)
    assert(one[Boolean](
      s"SELECT graft_robots_can_fetch('http://x.com/private/1', '$body')") === false)
    assert(one[Boolean](s"SELECT graft_robots_valid('$body')") === true)
  }

  test("wrong arity fails analysis instead of miscomputing") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sld('a.com', 'b.com')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("argument"), e.getMessage)
  }
}
