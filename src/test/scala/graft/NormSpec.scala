package graft

import graft.pipeline.TextNorm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // explicit code points so composed vs decomposed inputs are unambiguous
  private val eAcuteC = "\u00e9"           // composed
  private val eAcuteD = "e\u0301"          // e + combining acute
  private val angstromSign = "\u212b"      // angstrom sign
  private val aRing = "\u00c5"             // A-ring composed

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.as("r")).head().getString(0)

  test("NFC composes combining sequences and singletons") {
    assert(one(TextNorm.nfc(lit(s"Caf$eAcuteD"))) == s"Caf$eAcuteC")
    assert(one(TextNorm.nfc(lit(angstromSign))) == aRing)
    assert(one(TextNorm.nfc(lit("plain ascii"))) == "plain ascii")
  }

  test("NFKC also folds compatibility characters") {
    assert(one(TextNorm.nfkc(lit("ﬁle"))) == "file")  // fi ligature
    assert(one(TextNorm.nfkc(lit("①"))) == "1")       // circled one
    assert(one(TextNorm.unicode_normalize(lit("ﬁ"), "NFKD")) == "fi")
  }

  test("strip_accents drops diacritics but keeps base letters") {
    assert(one(TextNorm.strip_accents(
      lit(s"Caf$eAcuteC naïve piña $angstromSign"))) ==
      "Cafe naive pina A")
    assert(one(TextNorm.strip_accents(lit(s"Caf$eAcuteD"))) == "Cafe")
  }

  test("whitespace and punctuation cleanup") {
    assert(one(TextNorm.normalize_whitespace(lit(" a \t\n b  c "))) == "a b c")
    assert(one(TextNorm.strip_punct(lit("a,b!c--d 9?"))) == "abcd 9")
    assert(one(TextNorm.clean(lit(s"  Mixed  CASE$angstromSign "))) ==
      "mixed case\u00e5")
  }

  test("nulls propagate, invalid form throws") {
    val r = Seq(1).toDF("x").select(TextNorm.nfc(lit(null).cast("string"))).head()
    assert(r.isNullAt(0))
    assertThrows[Exception] {
      Seq(1).toDF("x")
        .select(TextNorm.unicode_normalize(lit("x"), "NOPE")).collect()
    }
  }

  test("SQL surface parity") {
    val r = spark.sql(
      s"SELECT pl_nfc('Caf$eAcuteD'), pl_strip_accents('${eAcuteC}è'), " +
        "pl_clean_text('  A  B '), pl_normalize_whitespace(' x  y '), " +
        "pl_strip_punct('a.b'), pl_nfkc('ﬁ'), " +
        s"pl_unicode_normalize('$eAcuteC', 'NFD')"
    ).head()
    assert(r.getString(0) == s"Caf$eAcuteC")
    assert(r.getString(1) == "ee")
    assert(r.getString(2) == "a b")
    assert(r.getString(3) == "x y")
    assert(r.getString(4) == "ab")
    assert(r.getString(5) == "fi")
    assert(r.getString(6) == eAcuteD)
  }

  test("normalize_url canonicalizes case, ports, fragments, slashes") {
    import org.apache.spark.sql.functions.lit
    def n(s: String) = one(TextNorm.normalize_url(lit(s)))
    // scheme+host lowercase; PATH case preserved
    assert(n("HTTP://ExAmple.COM/Path/File") == "http://example.com/Path/File")
    // default ports strip, scheme-matched only
    assert(n("http://h.com:80/x") == "http://h.com/x")
    assert(n("https://h.com:443/x") == "https://h.com/x")
    assert(n("http://h.com:8080/x") == "http://h.com:8080/x")
    assert(n("https://h.com:80/x") == "https://h.com:80/x") // not https' default
    assert(n("http://h.com:80") == "http://h.com")
    assert(n("http://h.com:80?q=1") == "http://h.com?q=1")
    // fragment strips; query survives; ONE trailing slash strips
    assert(n("http://h.com/a?q=UP#Frag") == "http://h.com/a?q=UP")
    assert(n("http://h.com/a/") == "http://h.com/a")
    assert(n("http://h.com/") == "http://h.com")
    // whitespace padding trims; idempotent
    assert(n("  http://EXAMPLE.com/a  ") == "http://example.com/a")
    assert(n("http://example.com/a") == "http://example.com/a")
    // scheme-less input: only the matching steps apply, nothing throws
    assert(n("not a url #x") == "not a url")
  }

  test("strip_html drops tags and comments, decodes entities in order") {
    assert(one(TextNorm.strip_html(lit("<p>a</p><br/>b"))) == " a  b")
    assert(one(TextNorm.strip_html(lit("x<!-- <b>hidden</b> -->y"))) == "x y")
    assert(one(TextNorm.strip_html(lit("a &amp; b &lt;tag&gt; &nbsp;&quot;q&quot;"))) ==
      "a & b <tag>  \"q\"")
    // &amp;lt; must decode to the literal string "&lt;", not "<"
    assert(one(TextNorm.strip_html(lit("&amp;lt;"))) == "&lt;")
    assert(one(TextNorm.normalize_whitespace(
      TextNorm.strip_html(lit("<div> spaced <i>text</i> </div>")))) == "spaced text")
  }

  test("url_host and url_domain extract authority and registered domain") {
    assert(one(TextNorm.url_host(lit("https://WWW.Example.COM:8080/p?q=1"))) ==
      "www.example.com")
    assert(one(TextNorm.url_host(lit("  http://a.b.c/x  "))) == "a.b.c")
    assert(one(TextNorm.url_host(lit("no scheme here"))) == "")
    assert(one(TextNorm.url_domain(lit("https://www.example.com/p"))) ==
      "example.com")
    assert(one(TextNorm.url_domain(lit("http://en.blog.site7.org/x"))) ==
      "site7.org")
    // single-label host passes through whole
    assert(one(TextNorm.url_domain(lit("http://localhost:9090/x"))) ==
      "localhost")
    assert(one(TextNorm.url_domain(lit("garbage"))) == "")
  }

  test("clean_lines keeps substantial lines, drops short and boilerplate ones") {
    val txt = lit(Seq(
      "this line stays around",      // 4 words -> kept
      "too short",                   // 2 words -> dropped
      "  padded line also stays  ",  // trims, 4 words -> kept trimmed
      "Enable JavaScript to view",   // marker (case-insensitive) -> dropped
      "please accept our cookie policy", // marker -> dropped
      "All Rights Reserved by us"    // marker -> dropped
    ).mkString("\n"))
    assert(one(TextNorm.clean_lines(txt)) ==
      "this line stays around\npadded line also stays")
    val kept = spark.range(1)
      .select(TextNorm.kept_lines(txt).cast("string")).head().getString(0)
    assert(kept == "2")
  }

  test("clean_lines terminal-punctuation rule and empty result") {
    val txt = lit("a proper full sentence.\nno terminal punctuation here")
    assert(one(TextNorm.clean_lines(txt, requireTerminal = true)) ==
      "a proper full sentence.")
    assert(one(TextNorm.clean_lines(lit("tiny\nwee"))) == "")
    val kept = spark.range(1)
      .select(TextNorm.kept_lines(lit("tiny\nwee")).cast("string"))
      .head().getString(0)
    assert(kept == "0")
  }
}
