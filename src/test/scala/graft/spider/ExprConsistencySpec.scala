package graft.spider

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spider.core.{Corpus, Hash64, HtmlCodec, Templates, UrlCanonical}
import graft.spider.expr.SpiderFunctions._

/** The engine/oracle consistency contract at the expression level: every
  * Catalyst expression must agree with the shared pure-Scala core, and the
  * built-in xxhash64 must agree with Hash64 (seed 42) — the URL-seen set
  * depends on it. */
class ExprConsistencySpec extends AnyFunSuite with SparkTestBase {

  private val urls = Seq(
    "https://src0.example.com/doc/0",
    "HTTP://Example.COM:80/a/../b%7E?q=1&p=2#frag",
    "https://x.example.net:8443/%41/./c",
    "http://user@HOST.example.org/path path", // space survives (not our job to encode)
    "https://src19.example.com/doc/499")

  test("built-in xxhash64 == Hash64.string (seed 42)") {
    import spark.implicits._
    val got = urls.toDF("s").select(col("s"), xxhash64(col("s"))).collect()
    got.foreach { r =>
      assert(r.getLong(1) == Hash64.string(r.getString(0)), s"hash mismatch for ${r.getString(0)}")
    }
  }

  test("url_canonicalize expression == UrlCanonical.canonicalize") {
    import spark.implicits._
    val got = urls.toDF("s").select(col("s"), url_canonicalize(col("s"))).collect()
    got.foreach { r =>
      assert(r.getString(1) == UrlCanonical.canonicalize(r.getString(0)))
    }
  }

  test("extract_text / extract_outlinks expressions == shared core (per-host templates)") {
    import spark.implicits._
    // pick one host per template so BOTH dispatch paths are exercised
    val hostP = (0 to 99).map(i => s"p$i.example.com")
      .find(h => Templates.forHost(h) == Templates.Paragraph).get
    val hostI = (0 to 99).map(i => s"i$i.example.com")
      .find(h => Templates.forHost(h) == Templates.ItemDesc).get
    val pages = Seq(
      (Templates.wrapFor(hostP, 1, "hello & <world>", Seq("https://a/1", "https://b/2")), hostP),
      (Templates.wrapFor(hostI, 2, "数据 表", Seq("https://c/3")), hostI),
      (Templates.wrapFor(hostI, 3, "", Seq("https://d/4")), hostI))
    val got = pages.toDF("html", "host")
      .select(col("html"), col("host"), extract_text(col("html"), col("host")),
        extract_outlinks(col("html"))).collect()
    got.foreach { r =>
      val html = r.getAs[Array[Byte]](0)
      val host = r.getString(1)
      assert(r.getString(2) == Templates.extractTextFor(host, html))
      assert(r.getSeq[String](3) == HtmlCodec.extractOutlinks(html))
    }
  }

  test("extract_text / extract_page: null host falls back to the default template; null html stays null") {
    import spark.implicits._
    val hostP = (0 to 99).map(i => s"p$i.example.com")
      .find(h => Templates.forHost(h) == Templates.Paragraph).get
    val html = Templates.wrapFor(hostP, 9, "kept text", Seq("https://e/5"))
    // an unparseable URL yields a null host (url_host semantics) — the row's
    // text must still be extracted under the default template, not nulled out
    val df = Seq((html, Option.empty[String]), (null: Array[Byte], Option("h.example.com")))
      .toDF("html", "host")
      .select(extract_text(col("html"), col("host")).as("t"),
        extract_page(col("html"), col("host")).as("p"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "kept text")
    assert(rows(0).getStruct(1).getString(0) == "kept text")
    assert(rows(0).getStruct(1).getSeq[String](1) == Seq("https://e/5"))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    // and the fallback rule is Templates.forHost(null) itself (oracle parity)
    assert(Templates.forHost(null) == Templates.Paragraph)
  }

  test("Templates: byte identity + field-selector semantics per template") {
    // identity for both templates, including entities and CJK
    val texts = Seq("hello & <world>", "数据 表 \"q\" 'a'", "", "plain text")
    for (t <- Templates.all; text <- texts) {
      val html = t.wrap(42L, text, Seq("https://x/1"), noiseLen = 0)
      assert(t.extractText(html) == text, s"template ${t.id}: $text")
      // outlink extraction is template-invariant
      assert(HtmlCodec.extractOutlinks(html) == Seq("https://x/1"))
    }
    // the ItemDesc selector must NOT pick up the price span or noise
    val html = Templates.ItemDesc.wrap(7L, "a desc", Seq.empty, noiseLen = 256)
    val doc = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    assert(doc.contains("class=\"price\""))
    assert(Templates.ItemDesc.extractTextStr(doc) == "a desc")
  }

  test("robots_allows expression == Corpus.robotsAllows") {
    import spark.implicits._
    val cases = Seq(
      ("https://h.example.com/doc/1", Seq("/doc/1")),
      ("https://h.example.com/doc/10", Seq("/doc/1")), // prefix match blocks /doc/10 too
      ("https://h.example.com/doc/2", Seq("/doc/1")),
      ("https://h.example.com/doc/2", Seq.empty[String]))
    val got = cases.toDF("url", "prefixes")
      .select(col("url"), col("prefixes"), robots_allows(col("url"), col("prefixes")))
      .collect()
    got.zip(cases).foreach { case (r, (u, ps)) =>
      assert(r.getBoolean(2) == Corpus.robotsAllows(u, ps), s"mismatch for $u vs $ps")
    }
  }

  test("SQL registration works end-to-end") {
    registerAll(spark)
    val r = spark.sql(
      "SELECT url_canonicalize('HTTP://A.com:80/x/../y') AS c").head()
    assert(r.getString(0) == "http://a.com/y")
  }
}
