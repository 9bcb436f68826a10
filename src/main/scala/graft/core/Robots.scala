package graft.core

/** Minimal robots.txt semantics as used by the reference discovery
  * strategy (frontera/strategy/discovery/__init__.py:78-86, 284-333,
  * 462-464): parse User-agent groups, collect Disallow/Allow prefixes for
  * `*`, deny URLs whose path matches a disallowed prefix. Validity check
  * mirrors is_valid_robotstxt (a line starting with a known directive). */
object Robots {

  final case class Rules(allow: Vector[String], disallow: Vector[String]) {
    /** Longest-prefix-match wins (Google semantics); empty disallow ⇒ allowed. */
    def canFetch(path0: String): Boolean = {
      val path = if (path0.isEmpty) "/" else path0
      val d = disallow.filter(p => p.nonEmpty && path.startsWith(p))
        .map(_.length).maxOption.getOrElse(-1)
      val a = allow.filter(p => p.nonEmpty && path.startsWith(p))
        .map(_.length).maxOption.getOrElse(-1)
      a >= d
    }
  }
  val AllowAll: Rules = Rules(Vector.empty, Vector.empty)

  /** is_valid_robotstxt (discovery/__init__.py:78-86): the FIRST
    * non-empty, non-comment line decides — it must start with
    * "user-agent:" or "sitemap:". An HTML error page served as
    * robots.txt is invalid even if a directive-looking line appears
    * later (exactly the reference's early-return loop; only the BOM is
    * stripped before the check, not whitespace). */
  def isValid(body: String): Boolean = {
    val it = body.linesIterator
    while (it.hasNext) {
      val line = it.next().toLowerCase
        .stripPrefix("\ufeff").stripSuffix("\ufeff")
      if (line.nonEmpty && !line.startsWith("#"))
        return line.startsWith("user-agent:") || line.startsWith("sitemap:")
    }
    false
  }

  /** Parse rules applying to User-agent: * (the reference crawls as a
    * generic agent). */
  def parse(body: String): Rules = {
    if (!isValid(body)) return AllowAll
    // group = consecutive user-agent lines + the rules that follow them
    var agents = Set.empty[String]
    var rulesSeen = false
    val allow = Vector.newBuilder[String]
    val disallow = Vector.newBuilder[String]
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (rulesSeen) { agents = Set.empty; rulesSeen = false }
            agents += value
          case "disallow" =>
            rulesSeen = true
            if (agents.contains("*") && value.nonEmpty) disallow += value
          case "allow" =>
            rulesSeen = true
            if (agents.contains("*") && value.nonEmpty) allow += value
          case _ =>
        }
      }
    }
    Rules(allow.result(), disallow.result())
  }

  /** Full check: canFetch(url) given a robots body for the url's host. */
  def canFetch(url: String, robotsBody: String): Boolean = {
    val p = UrlUtil.urlparse(url)
    val path = p.path + (if (p.query.nonEmpty) "?" + p.query else "")
    parse(robotsBody).canFetch(path)
  }
}
