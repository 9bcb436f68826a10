package graft.core

/** URL parsing + canonicalization with the reference's observable
  * semantics.
  *
  * `PyUrl` mirrors CPython `urllib.parse.urlparse` (the reference parses
  * every URL with it: frontera/utils/url.py:7-11, 39-44).
  * `canonicalize` mirrors the w3lib `canonicalize_url` rules applied by the
  * reference's fingerprint middleware
  * (frontera/contrib/middlewares/fingerprint.py:75-82): lowercase scheme +
  * host, sorted query pairs, normalized percent-encoding, fragment
  * dropped, empty path -> "/".
  */
final case class PyUrl(
    scheme: String,
    netloc: String,
    path: String,
    params: String,
    query: String,
    fragment: String) {

  /** Lowercased host without userinfo/port; None when absent.
    * Mirrors CPython `_NetlocResultMixinBase._hostinfo`. */
  def hostname: Option[String] = {
    val at = netloc.lastIndexOf('@')
    val hostinfo = if (at >= 0) netloc.substring(at + 1) else netloc
    val host =
      if (hostinfo.startsWith("[")) {
        val close = hostinfo.indexOf(']')
        if (close >= 0) hostinfo.substring(1, close) else hostinfo.substring(1)
      } else {
        val colon = hostinfo.indexOf(':')
        if (colon >= 0) hostinfo.substring(0, colon) else hostinfo
      }
    if (host.isEmpty) None else Some(host.toLowerCase)
  }
}

object UrlUtil {

  /** CPython urllib.parse.urlparse port (string splitting only — no
    * validation, identical tokenization). */
  def urlparse(url0: String): PyUrl = {
    var url = url0
    var fragment = ""
    // fragment first? CPython splits scheme first, then fragment inside
    // urlsplit; net effect identical for '#' handling: fragment = after
    // first '#'.
    var scheme = ""
    val colon = url.indexOf(':')
    if (colon > 0 && isValidScheme(url.substring(0, colon))) {
      scheme = url.substring(0, colon).toLowerCase
      url = url.substring(colon + 1)
    }
    var netloc = ""
    if (url.startsWith("//")) {
      var end = url.length
      var i = 2
      var found = false
      while (i < url.length && !found) {
        val c = url.charAt(i)
        if (c == '/' || c == '?' || c == '#') { end = i; found = true }
        i += 1
      }
      netloc = url.substring(2, end)
      url = url.substring(end)
    }
    val hash = url.indexOf('#')
    if (hash >= 0) { fragment = url.substring(hash + 1); url = url.substring(0, hash) }
    var query = ""
    val qm = url.indexOf('?')
    if (qm >= 0) { query = url.substring(qm + 1); url = url.substring(0, qm) }
    // urlparse (vs urlsplit): split ';params' off the LAST path segment.
    var path = url
    var params = ""
    if (path.contains(';')) {
      val lastSlash = path.lastIndexOf('/')
      val segStart = if (lastSlash >= 0) lastSlash else 0
      val semi = path.indexOf(';', segStart)
      if (semi >= 0) { params = path.substring(semi + 1); path = path.substring(0, semi) }
    }
    PyUrl(scheme, netloc, path, params, query, fragment)
  }

  private def isValidScheme(s: String): Boolean =
    s.nonEmpty && s.charAt(0).isLetter && s.forall(c =>
      c.isLetterOrDigit || c == '+' || c == '-' || c == '.')

  /** reference frontera/utils/url.py:39-44 (netloc, hostname, scheme). */
  def parseDomainFast(url: String): (String, String, String) = {
    val p = urlparse(url)
    (p.netloc, p.hostname.getOrElse(""), p.scheme)
  }

  /** Hostname used as the politeness slot key
    * (reference frontera/core/__init__.py:10-25, key_type="domain"). */
  def slotKey(url: String): String = urlparse(url).hostname.getOrElse("")

  /** get_slot_key with key_type="ip" (reference core/__init__.py:20-24:
    * first `getaddrinfo(host, 80)` result). Network lookups don't belong
    * inside a deterministic distributed operator, so the resolver is
    * INJECTED: pass `java.net.InetAddress.getByName(_).getHostAddress`
    * (with an executor-side cache) for real DNS, or any deterministic
    * stub for tests/offline runs. Hosts the resolver throws on keep the
    * hostname key, like the reference's fallthrough. */
  def slotKeyIp(url: String, resolve: String => String): String = {
    val host = slotKey(url)
    try { val ip = resolve(host); if (ip != null && ip.nonEmpty) ip else host }
    catch { case _: Exception => host }
  }

  /** Deterministic offline resolver stub: a stable fake IPv4 derived
    * from the hostname hash — same shape as real resolution (distinct
    * hosts on one IP collide into one politeness slot), no network. */
  def fakeResolver(host: String): String = {
    val h = Hashing.signedCrc32(host) & 0xffffffffL
    s"10.${(h >> 16) & 0xff}.${(h >> 8) & 0xff}.${h & 0xff}"
  }

  // ---- discovery-strategy helpers (strategy/discovery/__init__.py) ----

  /** 2nd-level (registrable) domain name of a hostname — reference
    * `_get_2ndlevel_name` (discovery/__init__.py:520-523), which calls
    * `PublicSuffixList.get_public_suffix` over the full Mozilla public
    * suffix list. [[PublicSuffix]] carries that list as a resource and
    * replicates the package's matching exactly (wildcards, exceptions,
    * implicit-`*` default). */
  def sld(hostname: String): String =
    PublicSuffix.registrable(
      hostname.toLowerCase.stripSuffix(".").dropWhile(_ == '.'))

  /** is_home_page_url (discovery/__init__.py:32-36): no query, and path
    * empty or one of the default home paths. */
  private val HomePaths: Set[String] = Set(
    "", "/", "index.html", "index.htm", "default.htm", "default.html")
  def isHomePage(url: String): Boolean = {
    val p = urlparse(url)
    p.query.isEmpty && HomePaths.contains(p.path)
  }

  // ---- canonicalization (w3lib.url.canonicalize_url parity) ----

  // urllib.parse.quote's always-safe set (Python 3.7+ includes '~').
  private val AlwaysSafe: Set[Byte] =
    ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_.-~")
      .getBytes("US-ASCII").toSet
  // w3lib _safe_chars = ALWAYS_SAFE + b"%;/?:@&=+$|,#"; path drops '#'.
  private val PathSafe: Set[Byte] =
    AlwaysSafe ++ "%;/?:@&=+$|,".getBytes("US-ASCII")

  private val Hex = "0123456789ABCDEF"

  private def quoteBytes(bs: Array[Byte], safe: Set[Byte]): String = {
    val sb = new StringBuilder(bs.length + 8)
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      if (safe.contains(b)) sb.append(b.toChar)
      else {
        sb.append('%').append(Hex((b >> 4) & 0xf)).append(Hex(b & 0xf))
      }
      i += 1
    }
    sb.toString
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-decode to raw bytes (unmatched '%' passes through), like
    * urllib.parse.unquote_to_bytes. plus=true additionally maps '+'->' '. */
  private def unquoteToBytes(s: String, plus: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    val utf8 = s.getBytes("UTF-8")
    var i = 0
    while (i < utf8.length) {
      val b = utf8(i)
      if (b == '%' && i + 2 < utf8.length &&
          hexVal(utf8(i + 1).toChar) >= 0 && hexVal(utf8(i + 2).toChar) >= 0) {
        out.write((hexVal(utf8(i + 1).toChar) << 4) | hexVal(utf8(i + 2).toChar))
        i += 3
      } else if (plus && b == '+') { out.write(' '); i += 1 }
      else { out.write(b); i += 1 }
    }
    out.toByteArray
  }

  /** w3lib _unquotepath: %2F/%3F stay encoded (they would change path
    * semantics if decoded), everything else percent-decodes. The escape
    * is case-preserving ('%2f' stays '%2f'), matching w3lib, which
    * protects each case variant with its own literal replacement. */
  private def unquotePath(path: String): Array[Byte] = {
    val protectd = path
      .replace("%2f", "%252f").replace("%2F", "%252F")
      .replace("%3f", "%253f").replace("%3F", "%253F")
    unquoteToBytes(protectd, plus = false)
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** parse_qsl(keep_blank_values=True) -> sort -> urlencode, on bytes. */
  private def canonicalQuery(query: String): String = {
    if (query.isEmpty) return ""
    val pairs = query.split("&", -1).filter(_.nonEmpty).map { field =>
      val eq = field.indexOf('=')
      val (k, v) = if (eq >= 0) (field.substring(0, eq), field.substring(eq + 1))
                   else (field, "")
      (unquoteToBytes(k, plus = true), unquoteToBytes(v, plus = true))
    }
    val sorted = pairs.sortWith { (x, y) =>
      val c = cmpBytes(x._1, y._1)
      if (c != 0) c < 0 else cmpBytes(x._2, y._2) < 0
    }
    sorted.map { case (k, v) =>
      quotePlus(k) + "=" + quotePlus(v)
    }.mkString("&")
  }

  // urllib.parse.quote_plus with safe='' (urlencode default)
  private def quotePlus(bs: Array[Byte]): String = {
    val sb = new StringBuilder(bs.length + 8)
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      if (AlwaysSafe.contains(b)) sb.append(b.toChar)
      else if (b == ' ') sb.append('+')
      else sb.append('%').append(Hex((b >> 4) & 0xf)).append(Hex(b & 0xf))
      i += 1
    }
    sb.toString
  }

  private def idnaHost(netloc: String): String = {
    if (netloc.forall(_ < 128)) netloc
    else try java.net.IDN.toASCII(netloc) catch { case _: Exception => netloc }
  }

  /** w3lib.url.canonicalize_url(url, keep_blank_values=True,
    * keep_fragments=False) parity. Idempotent. */
  def canonicalize(url: String): String = {
    val p = urlparse(url.trim)
    val scheme = p.scheme
    val netloc = idnaHost(p.netloc).toLowerCase.stripSuffix(":")
    val path0 = quoteBytes(unquotePath(p.path), PathSafe)
    val path = if (path0.isEmpty) "/" else path0
    val query = canonicalQuery(p.query)
    val sb = new StringBuilder
    if (scheme.nonEmpty) sb.append(scheme).append(':')
    // urlunparse: '//' only with a netloc (or a path that itself starts
    // with '//'); bare-scheme URLs like mailto: stay scheme:path.
    if (netloc.nonEmpty || path.startsWith("//")) sb.append("//").append(netloc)
    sb.append(path)
    if (p.params.nonEmpty) sb.append(';').append(p.params)
    if (query.nonEmpty) sb.append('?').append(query)
    sb.toString
  }
}
