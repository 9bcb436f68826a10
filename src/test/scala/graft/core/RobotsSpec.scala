package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** robots.txt semantics (reference discovery strategy F3,
  * frontera/strategy/discovery/__init__.py:78-86, 284-333). */
class RobotsSpec extends AnyFunSuite {
  val body =
    """# robots
      |User-agent: *
      |Disallow: /private/
      |Disallow: /tmp
      |Allow: /private/ok/
      |
      |User-agent: evilbot
      |Disallow: /
      |""".stripMargin

  test("validity check") {
    assert(Robots.isValid(body))
    assert(!Robots.isValid("<html>not a robots file</html>"))
    assert(!Robots.isValid(""))
  }

  test("allow/deny with longest-prefix-match") {
    assert(Robots.canFetch("http://a.com/", body))
    assert(Robots.canFetch("http://a.com/pub/x", body))
    assert(!Robots.canFetch("http://a.com/private/x", body))
    assert(Robots.canFetch("http://a.com/private/ok/x", body))
    assert(!Robots.canFetch("http://a.com/tmp123", body))
    // evilbot group must not leak into *
    assert(Robots.canFetch("http://a.com/anything", body))
  }

  test("invalid/empty body allows everything") {
    assert(Robots.canFetch("http://a.com/private/x", ""))
    assert(Robots.canFetch("http://a.com/private/x", "<html>503</html>"))
  }

  test("grouped agents: rules attach to all agents of the group") {
    val b = "User-agent: foo\nUser-agent: *\nDisallow: /x/"
    assert(!Robots.canFetch("http://a.com/x/1", b))
    assert(Robots.canFetch("http://a.com/y", b))
  }
}
