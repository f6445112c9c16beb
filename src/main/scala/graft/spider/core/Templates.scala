package graft.spider.core

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** Per-host extraction templates (SURVEY.md "per-site template dispatch" —
  * the reference parses JD vs Taobao commodity pages with different CSS
  * selectors; VERDICT r4 task #8).
  *
  * A template owns BOTH sides of the byte-identity contract: the fixture
  * generator's wrap and the selector-style text extraction that inverts it.
  * The host-keyed registry ([[Templates.forHost]]) is the ONE dispatch
  * point, shared by the Spark synthesizer, the Catalyst extraction
  * expressions and the single-threaded oracle — so per-host semantics
  * cannot drift between engine and oracle.
  *
  * Two templates ship:
  *  - [[Templates.Paragraph]] — article-style pages: text as `<p>` elements
  *    (the original HtmlCodec semantics, which it delegates to);
  *  - [[Templates.ItemDesc]] — commodity-style pages: the item description
  *    in `<span class="item-desc">` inside an item `<div>`, with a price
  *    span the extractor must NOT pick up (field-selector semantics, the
  *    EC-Spider shape).
  *
  * Outlink markup (`<a href>`) is template-invariant, so E6 extraction
  * needs no dispatch.
  */
object Templates {

  sealed abstract class Template(val id: String) {
    /** Deterministic page wrap; the template's extractor inverts it
      * byte-for-byte on the `text` payload. */
    def wrap(docId: Long, text: String, outlinks: Seq[String], noiseLen: Int): Array[Byte]
    /** Selector-style text extraction over the decoded document. */
    def extractTextStr(doc: String): String
    final def extractText(html: Array[Byte]): String =
      if (html == null) null else extractTextStr(new String(html, UTF_8))
  }

  /** Article template: every `<p>` element (HtmlCodec's semantics). */
  case object Paragraph extends Template("p") {
    def wrap(docId: Long, text: String, outlinks: Seq[String], noiseLen: Int): Array[Byte] =
      HtmlCodec.wrap(docId, text, outlinks, noiseLen)
    def extractTextStr(doc: String): String = HtmlCodec.extractTextStr(doc)
  }

  /** Commodity template: item fields in class-tagged spans; only the
    * `item-desc` span's text is the extracted payload — the price span and
    * everything else is selector-ignored. */
  case object ItemDesc extends Template("item") {
    private val DescOpen = "<span class=\"item-desc\">"
    private val SpanClose = "</span>"

    def wrap(docId: Long, text: String, outlinks: Seq[String], noiseLen: Int): Array[Byte] = {
      val sb = new StringBuilder(text.length + 320 + noiseLen)
      sb.append("<html><head><title>item ").append(docId).append("</title></head><body>\n")
      sb.append("<div class=\"item\">")
        .append("<span class=\"price\">&#165;").append(docId % 9973).append(".00</span>")
        .append(DescOpen).append(HtmlCodec.encodeEntities(text)).append(SpanClose)
        .append("</div>\n")
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

    def extractTextStr(doc: String): String = {
      val parts = new ArrayBuffer[String](2)
      var i = 0
      val n = doc.length
      while (i < n) {
        val open = doc.indexOf(DescOpen, i)
        if (open < 0) { i = n }
        else {
          val start = open + DescOpen.length
          val close = doc.indexOf(SpanClose, start)
          val end = if (close < 0) n else close
          parts += HtmlCodec.decodeEntities(HtmlCodec.stripTagSpans(doc.substring(start, end)))
          i = if (close < 0) n else close + SpanClose.length
        }
      }
      parts.mkString(" ")
    }
  }

  val all: Seq[Template] = Seq(Paragraph, ItemDesc)

  /** The host-keyed registry: which template parses pages of `host`.
    * Deterministic hash split — both templates are active on any corpus
    * with a handful of hosts (asserted in the e2e specs). A production
    * deployment would load an explicit host → template table; the dispatch
    * point is the same.
    *
    * A null host (URL whose host cannot be parsed) dispatches to the
    * article default — extraction must still produce text for such rows,
    * and the rule must be THIS function so the Catalyst expressions and
    * the single-threaded oracle agree on it. */
  def forHost(host: String): Template =
    if (host == null) Paragraph
    else if (Hash64.pmod(Hash64.string("tpl-" + host), 2L) == 0L) Paragraph else ItemDesc

  /** Dispatch wrap by host. */
  def wrapFor(host: String, docId: Long, text: String, outlinks: Seq[String],
      noiseLen: Int = 0): Array[Byte] =
    forHost(host).wrap(docId, text, outlinks, noiseLen)

  /** Dispatch extraction by host. */
  def extractTextFor(host: String, html: Array[Byte]): String =
    forHost(host).extractText(html)
}
