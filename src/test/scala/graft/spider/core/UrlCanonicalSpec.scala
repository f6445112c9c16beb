package graft.spider.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class UrlCanonicalSpec extends AnyFunSuite with GenSampling {
  import UrlCanonical.canonicalize

  test("RFC 3986 §6 vector table") {
    val vectors = Seq(
      "HTTP://Example.COM/" -> "http://example.com/",
      "https://example.com" -> "https://example.com/",
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "https://example.com:8443/a" -> "https://example.com:8443/a",
      "http://example.com/a/./b" -> "http://example.com/a/b",
      "http://example.com/a/b/../c" -> "http://example.com/a/c",
      "http://example.com/../a" -> "http://example.com/a",
      "http://example.com/%7Euser" -> "http://example.com/~user",
      "http://example.com/%7euser" -> "http://example.com/~user",
      "http://example.com/%2fa" -> "http://example.com/%2Fa",
      "http://example.com/a?b=1&a=2" -> "http://example.com/a?b=1&a=2", // order preserved
      "http://example.com/a#frag" -> "http://example.com/a",
      "http://example.com/a?" -> "http://example.com/a",
      "http://example.com/%41%42" -> "http://example.com/AB",
      "http://EXAMPLE.com/Path/IS/Case/Sensitive" -> "http://example.com/Path/IS/Case/Sensitive",
      "  http://example.com/a  " -> "http://example.com/a",
      "http://user:pw@Example.com/x" -> "http://user:pw@example.com/x")
    vectors.foreach { case (in, want) => assert(canonicalize(in) == want, s"input=$in") }
  }

  test("null / non-absolute passthrough") {
    assert(canonicalize(null) == null)
    assert(canonicalize("mailto:x@y.z") == "mailto:x@y.z")
    assert(canonicalize("/relative/path#f") == "/relative/path")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
    host <- Gen.oneOf("Example.COM", "a.b.example.org", "X.example.net")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, Gen.oneOf("a", "B", "..", ".", "%7e", "%41", "doc"))
    q <- Gen.oneOf("", "?x=1&y=%7e", "?b=2&a=1")
    f <- Gen.oneOf("", "#frag")
  } yield s"$scheme://$host$port/${segs.mkString("/")}$q$f"

  test("idempotence: canon(canon(u)) == canon(u)") {
    forAll(urlGen) { (u: String) => assert(canonicalize(canonicalize(u)) == canonicalize(u)) }
  }

  test("equivalence classes collapse") {
    assert(canonicalize("HTTP://A.com:80/x/../y%7E?q=1#z") == canonicalize("http://a.COM/y~?q=1"))
  }

  test("host/path accessors") {
    assert(UrlCanonical.host("https://user@x.example.com:8443/a/b?q=1") == "x.example.com")
    assert(UrlCanonical.path("https://x.example.com/a/b?q=1") == "/a/b")
    assert(UrlCanonical.path("https://x.example.com") == "/")
  }
}
