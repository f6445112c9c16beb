package graft.spider.core

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** HTML wrap/extract core (SURVEY.md §2.2 E5/E6, FIXTURES.md §1).
  *
  * ONE shared implementation of the item-parsing semantics: the fixture
  * generator's `wrap`, the Catalyst `extract_text`/`extract_outlinks`
  * expressions, and the single-threaded oracle all call these functions, so
  * the byte-identity invariant `extractText(wrap(text)) == text` is
  * structural, not coincidental.
  *
  * Extraction semantics (normative):
  *   - UTF-8 decode the html bytes;
  *   - take the text content of every `<p>` element in document order
  *     (any tags nested inside a `<p>` are stripped);
  *   - decode entities `&amp; &lt; &gt; &quot; &#39;` plus numeric
  *     `&#NNN;` / `&#xHH;`;
  *   - join paragraph contents with a single space.
  *   Titles, anchors, scripts, styles and all other elements are ignored.
  */
object HtmlCodec {

  /** Entity-encode the five XML-significant characters. */
  def encodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\'' => sb.append("&#39;")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Decode the five named entities + numeric (decimal and hex) references.
    * Unknown/malformed references pass through verbatim. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: String = body match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if body.length > 1 && body.charAt(0) == '#' =>
              try {
                val cp =
                  if (body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                    Integer.parseInt(body.substring(2), 16)
                  else Integer.parseInt(body.substring(1))
                if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
              } catch { case _: NumberFormatException => null }
            case _ => null
          }
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Deterministic Common-Crawl-style page wrap (FIXTURES.md §1). The
    * extractor inverts this byte-for-byte on the `text` payload.
    *
    * `noiseLen` > 0 pads the page with that many bytes of extractor-ignored
    * markup (boilerplate divs inside a trailing script block) — used by the
    * bench to give pages realistic Common-Crawl sizes (tens of KB) so the
    * per-URL extraction work is honest; the byte-identity invariant is
    * untouched because the extractor skips everything outside `<p>`. */
  def wrap(docId: Long, text: String, outlinks: Seq[String], noiseLen: Int = 0): Array[Byte] = {
    val sb = new StringBuilder(text.length + 256 + noiseLen)
    sb.append("<html><head><title>doc ").append(docId).append("</title></head><body>\n")
    sb.append("<p>").append(encodeEntities(text)).append("</p>\n")
    var j = 0
    while (j < outlinks.length) {
      sb.append("<a href=\"").append(outlinks(j)).append("\">l").append(j + 1).append("</a>")
      j += 1
    }
    sb.append('\n')
    sb.append("<script>/* noise ignored by extractor */</script>\n")
    if (noiseLen > 0) {
      sb.append("<script>/*")
      val pattern = "boilerplate-" + (docId % 97) + " nav footer sidebar tracker "
      var remaining = noiseLen
      while (remaining > 0) {
        val chunk = math.min(remaining, pattern.length)
        sb.append(pattern, 0, chunk)
        remaining -= chunk
      }
      sb.append("*/</script>\n")
    }
    sb.append("</body></html>")
    sb.toString.getBytes(UTF_8)
  }

  /** E5: selector-style text extraction — every `<p>` element's text
    * content, entity-decoded, joined with one space. */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return null
    extractTextStr(new String(html, UTF_8))
  }

  def extractTextStr(doc: String): String = {
    val parts = new ArrayBuffer[String](4)
    var i = 0
    val n = doc.length
    while (i < n) {
      val open = doc.indexOf("<p", i)
      if (open < 0) { i = n }
      else {
        // must be "<p>" or "<p ...>" — not e.g. "<pre>"
        val afterIdx = open + 2
        if (afterIdx < n && (doc.charAt(afterIdx) == '>' || doc.charAt(afterIdx) == ' ' ||
            doc.charAt(afterIdx) == '\t' || doc.charAt(afterIdx) == '\n')) {
          val tagEnd = doc.indexOf('>', open)
          if (tagEnd < 0) { i = n }
          else {
            val close = doc.indexOf("</p>", tagEnd + 1)
            val contentEnd = if (close < 0) n else close
            parts += decodeEntities(stripTags(doc.substring(tagEnd + 1, contentEnd)))
            i = if (close < 0) n else close + 4
          }
        } else i = open + 2
      }
    }
    parts.mkString(" ")
  }

  /** Drop any <...> spans nested inside an element (shared with the
    * template extractors in [[Templates]]). */
  private[core] def stripTagSpans(s: String): String = stripTags(s)

  /** Drop any <...> spans nested inside a paragraph. */
  private def stripTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** E6: ordered href values of `<a>` tags, verbatim (canonicalization is
    * applied downstream, not here). */
  def extractOutlinks(html: Array[Byte]): Seq[String] = {
    if (html == null) return null
    extractOutlinksStr(new String(html, UTF_8))
  }

  def extractOutlinksStr(doc: String): Seq[String] = {
    val out = new ArrayBuffer[String](4)
    var i = 0
    val n = doc.length
    while (i < n) {
      val open = doc.indexOf("<a", i)
      if (open < 0) { i = n }
      else {
        val afterIdx = open + 2
        if (afterIdx < n && (doc.charAt(afterIdx) == ' ' || doc.charAt(afterIdx) == '\t' ||
            doc.charAt(afterIdx) == '\n' || doc.charAt(afterIdx) == '>')) {
          val tagEnd = doc.indexOf('>', open)
          val limit = if (tagEnd < 0) n else tagEnd
          val tag = doc.substring(open, limit)
          val href = hrefOf(tag)
          if (href != null) out += href
          i = limit + 1
        } else i = open + 2
      }
    }
    out.toSeq
  }

  private def hrefOf(tag: String): String = {
    val k = tag.indexOf("href=")
    if (k < 0) return null
    val vStart = k + 5
    if (vStart >= tag.length) return null
    val quote = tag.charAt(vStart)
    if (quote == '"' || quote == '\'') {
      val end = tag.indexOf(quote, vStart + 1)
      if (end < 0) null else tag.substring(vStart + 1, end)
    } else {
      var end = vStart
      while (end < tag.length && tag.charAt(end) != ' ' && tag.charAt(end) != '\t') end += 1
      tag.substring(vStart, end)
    }
  }
}
