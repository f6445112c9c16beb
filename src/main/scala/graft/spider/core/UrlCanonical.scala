package graft.spider.core

/** RFC 3986 §6 URL canonicalization (SURVEY.md §2.2 E1) — ONE shared
  * implementation used by both the single-threaded oracle and the Catalyst
  * expression, so canonical forms (and therefore url hashes and the seen
  * set) are identical across the two executions.
  *
  * Normative rules:
  *   - lowercase scheme and host
  *   - strip default ports (:80 for http, :443 for https)
  *   - percent-decode unreserved characters; uppercase remaining escapes
  *   - remove dot-segments from the path (RFC 3986 §5.2.4)
  *   - drop the fragment
  *   - empty path → "/"
  *   - PRESERVE query parameter order (crawlers must not reorder); drop a
  *     bare trailing "?"
  *   - idempotent: canonicalize(canonicalize(u)) == canonicalize(u)
  *
  * Non-absolute inputs (no "://") are returned trimmed and fragment-stripped
  * but otherwise untouched; the engine only enqueues http(s) URLs anyway.
  */
object UrlCanonical {

  def canonicalize(raw: String): String = {
    if (raw == null) return null
    var s = raw.trim
    // Drop fragment first — applies to every input shape.
    val hashIdx = s.indexOf('#')
    if (hashIdx >= 0) s = s.substring(0, hashIdx)

    val schemeSep = s.indexOf("://")
    if (schemeSep <= 0) return s
    val scheme = s.substring(0, schemeSep).toLowerCase
    val rest = s.substring(schemeSep + 3)

    // authority = up to first '/' or '?'
    var authEnd = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') { authEnd = i; found = true }
      i += 1
    }
    val authority = rest.substring(0, authEnd)
    val after = rest.substring(authEnd)

    // Split userinfo (kept verbatim) from host[:port].
    val atIdx = authority.lastIndexOf('@')
    val userinfo = if (atIdx >= 0) authority.substring(0, atIdx + 1) else ""
    val hostPort = if (atIdx >= 0) authority.substring(atIdx + 1) else authority
    val colonIdx = hostPort.lastIndexOf(':')
    // IPv6 literals ([::1]:8080) — only treat ':' after the ']' as a port sep.
    val bracketEnd = hostPort.lastIndexOf(']')
    val (host0, port) =
      if (colonIdx > bracketEnd && colonIdx >= 0)
        (hostPort.substring(0, colonIdx), hostPort.substring(colonIdx + 1))
      else (hostPort, "")
    val host = host0.toLowerCase
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val canonAuthority = userinfo + host + (if (keepPort) ":" + port else "")

    // Split path from query.
    val qIdx = after.indexOf('?')
    val rawPath = if (qIdx >= 0) after.substring(0, qIdx) else after
    val rawQuery = if (qIdx >= 0) after.substring(qIdx + 1) else null

    val path0 = normalizePercent(rawPath)
    val path1 = removeDotSegments(path0)
    val path = if (path1.isEmpty) "/" else path1
    val query = if (rawQuery == null || rawQuery.isEmpty) null else normalizePercent(rawQuery)

    val sb = new StringBuilder(s.length)
    sb.append(scheme).append("://").append(canonAuthority).append(path)
    if (query != null) sb.append('?').append(query)
    sb.toString
  }

  /** Host component of a canonical URL; null if not authority-shaped. */
  def host(canonicalUrl: String): String = {
    if (canonicalUrl == null) return null
    val sep = canonicalUrl.indexOf("://")
    if (sep <= 0) return null
    val rest = canonicalUrl.substring(sep + 3)
    var end = rest.length
    var i = 0
    while (i < end) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { end = i }
      else i += 1
    }
    val auth = rest.substring(0, end)
    val at = auth.lastIndexOf('@')
    val hp = if (at >= 0) auth.substring(at + 1) else auth
    val br = hp.lastIndexOf(']')
    val colon = hp.lastIndexOf(':')
    if (colon > br && colon >= 0) hp.substring(0, colon) else hp
  }

  /** Path component ("/..." ) of a canonical URL; "/" if empty. */
  def path(canonicalUrl: String): String = {
    if (canonicalUrl == null) return null
    val sep = canonicalUrl.indexOf("://")
    val start0 = if (sep <= 0) 0 else sep + 3
    val slash = canonicalUrl.indexOf('/', start0)
    if (slash < 0) return "/"
    val q = canonicalUrl.indexOf('?', slash)
    if (q < 0) canonicalUrl.substring(slash) else canonicalUrl.substring(slash, q)
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved percent-escapes; uppercase the hex of the rest.
    * Malformed escapes pass through verbatim. Idempotent. */
  private[core] def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h1 = hexVal(s.charAt(i + 1)); val h2 = hexVal(s.charAt(i + 2))
        if (h1 >= 0 && h2 >= 0) {
          val v = (h1 << 4) | h2
          if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
          else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[core] def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        // move first segment (incl. leading '/') to output
        val start = if (in.charAt(0) == '/') 1 else 0
        val nextSlash = in.indexOf('/', start)
        val seg = if (nextSlash < 0) in else in.substring(0, nextSlash)
        out += seg
        in = if (nextSlash < 0) "" else in.substring(nextSlash)
      }
    }
    out.mkString
  }
}
