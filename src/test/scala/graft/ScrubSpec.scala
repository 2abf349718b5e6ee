package graft

import graft.pipeline.Scrub
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** PII scrubbing: planted emails/IPs/phones are redacted with correct
  * counts, clean text passes through untouched, and the redaction
  * order prevents cross-pattern half-matches. */
class ScrubSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scrub(text: String): (String, Long, Long, Long) = {
    val r = Seq(text).toDF("text")
      .select(Scrub.scrubPii(col("text")).as("s"),
        Scrub.piiCounts(col("text")).as("c"))
      .select("s", "c.emails", "c.ips", "c.phones")
      .collect().head
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  "scrubPii" should "redact an email, an IP and a phone in one text" in {
    val (s, e, i, p) =
      scrub("mail a.user+tag@sub.example.org, host 192.168.0.1, call +1 555-010-9999 now")
    s shouldBe "mail <EMAIL>, host <IP>, call <PHONE> now"
    (e, i, p) shouldBe ((1L, 1L, 1L))
  }

  it should "pass clean text through untouched" in {
    val (s, e, i, p) = scrub("no personal data in this sentence at all")
    s shouldBe "no personal data in this sentence at all"
    (e, i, p) shouldBe ((0L, 0L, 0L))
  }

  it should "not count an IP's digit runs as a phone" in {
    // without the IP-before-phone order, 192.168.0.1 would survive as
    // digit runs; and the phone pattern must not swallow dotted quads
    val (s, _, i, p) = scrub("server at 10.20.30.40 port open")
    s shouldBe "server at <IP> port open"
    (i, p) shouldBe ((1L, 0L))
  }

  it should "redact multiple instances of the same kind" in {
    val (s, e, _, _) = scrub("cc a@b.co and c@d.org please")
    s shouldBe "cc <EMAIL> and <EMAIL> please"
    e shouldBe 2L
  }

  it should "redact parenthesized and dashed phone forms" in {
    val (s, _, _, p) = scrub("dial (555) 010-2222 or 555-010-3333")
    s shouldBe "dial <PHONE> or <PHONE>"
    p shouldBe 2L
  }

  "scrubTable" should "scrub in place and attach count columns" in {
    val df = Seq((1L, "write to x@y.io"), (2L, "clean")).toDF("doc_id", "text")
    val out = Scrub.scrubTable(df, "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe (("write to <EMAIL>", 1L))
    out(2L) shouldBe (("clean", 0L))
  }

  // ----- Unicode / whitespace cleaning -----

  private def clean1(s: String, form: String = "NFC"): String =
    Seq(Tuple1(s)).toDF("t")
      .select(Scrub.cleanText(col("t"), form).as("c"))
      .collect().head.getString(0)

  "normalizeUnicode" should "compose NFC and fold NFKC compatibility forms" in {
    def norm(s: String, form: String) =
      Seq(Tuple1(s)).toDF("t")
        .select(Scrub.normalizeUnicode(col("t"), form).as("n"))
        .collect().head.getString(0)
    val decomposed = "cafe\u0301"      // e + combining acute
    val composed = "caf\u00e9"         // precomposed e-acute
    norm(decomposed, "NFC") shouldBe composed
    norm(composed, "NFD") shouldBe decomposed
    norm("\ufb01le \u2460", "NFKC") shouldBe "file 1" // fi-ligature, circled 1
    norm("\ufb01le", "NFC") shouldBe "\ufb01le"        // NFC keeps the ligature
    // NULL propagates; unknown form rejected at construction
    Seq(Tuple1(null: String)).toDF("t")
      .select(Scrub.normalizeUnicode(col("t")).as("n"))
      .collect().head.isNullAt(0) shouldBe true
    an[IllegalArgumentException] should be thrownBy
      Seq(Tuple1("x")).toDF("t")
        .select(Scrub.normalizeUnicode(col("t"), "NFX")).collect()
  }

  "cleanText" should "apply the full recipe in order" in {
    clean1(" cafe\u0301 one\ttwo  three \r\nfour\r\r\n\r\nfive ") shouldBe
      "caf\u00e9 one two three\nfour\n\nfive"
    // paragraph cap: three-plus newlines become exactly two
    clean1("a\n\n\n\n\nb") shouldBe "a\n\nb"
    // BEL and VT strip; tab collapses to a space
    clean1("a\u0007b\u000Bc\td") shouldBe "abc d"
  }

  it should "be idempotent" in {
    val dirty = " xe\u0301 y \r\n\r\n\r\n z\t\t"
    val once = clean1(dirty)
    clean1(once) shouldBe once
  }

  "stripHtml" should "drop script/style WITH contents, tags to spaces, unescape entities" in {
    def strip(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(Scrub.stripHtml(col("t")).as("c"))
        .collect().head.getString(0)
    strip("<script>var a=1;\nvar b=2;</script>keep") shouldBe " keep"
    strip("""<style media="all">p{}</style>x""") shouldBe " x"
    strip("<styled-div>kept</styled-div>") shouldBe " kept " // not style
    strip("a<br>b") shouldBe "a b"                  // boundary preserved
    strip("<!-- note\nmore -->z") shouldBe " z"
    strip("&amp;lt; &lt;b&gt; &quot;q&quot; &#39;a&apos;") shouldBe
      "&lt; <b> \"q\" 'a'"                          // &amp; decoded LAST
    strip("2 &lt; 3 &amp;&amp; 4 &gt; 1") shouldBe "2 < 3 && 4 > 1"
  }

  it should "compose with cleanText via stripHtmlTable" in {
    val df = Seq((1L, "<p>a</p>\r\n\r\n\r\n<p>b</p>")).toDF("doc_id", "text")
    Scrub.stripHtmlTable(df, "text").collect().head.getString(1) shouldBe
      "a\n\nb"
  }

  "the cleaning functions" should "be callable from SQL" in {
    graft.functions.GraftFunctions.register(spark)
    // NOTE: Spark's chr() wraps at 256, so the combining acute comes
    // in as a \u escape, not chr(769)
    spark.sql("SELECT clean_text(' a  b\r\nc ') AS c, " +
        "strip_html('<b>x</b> &amp; y') AS h, " +
        "canonicalize_url('HTTP://X.com/P?utm_a=1') AS u, " +
        "fix_mojibake('cafÃ©') AS m, " +
"unicode_normalize('cafe\u0301', 'NFC') AS n")
      .collect().head.toSeq shouldBe
      Seq("a b\nc", " x  & y", "http://x.com/P", "café", "café")
    // SQL ≡ Column API on adversarial inputs (the divergence guard for
    // the registry's direct-Catalyst builders)
    val dirty = Seq(
      "<style>p{}</style><p>a&amp;lt;b</p>\r\n\r\n\r\n x\t y ",
      "HTTPS://S.com/A?utm_a=1&b=2&gclid=x#f",
      "plain").toDF("t")
    dirty.selectExpr("clean_text(strip_html(t)) AS x",
        "canonicalize_url(t) AS y").collect().map(_.toSeq).toSeq shouldBe
      dirty.select(
        Scrub.cleanText(Scrub.stripHtml(col("t"))).as("x"),
        Scrub.canonicalizeUrl(col("t")).as("y"))
        .collect().map(_.toSeq).toSeq
  }

  "fixMojibake" should "repair single and double windows-1252 mis-decoding" in {
    def fix(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(Scrub.fixMojibake(col("t")).as("c"))
        .collect().head.getString(0)
    def corrupt(s: String): String = new String(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
    val clean = "café’s naïve — ok"
    corrupt(clean) should not be clean // the fixture is really broken
    fix(corrupt(clean)) shouldBe clean           // single mis-decode
    // double mis-decode repairs when the intermediate decode was
    // lossless; the em dash's second round hits cp1252-undefined 0x9D
    // (→ U+FFFD, information destroyed), so it uses a dash-free string
    val clean2 = "café’s naïve ok"
    fix(corrupt(corrupt(clean2))) shouldBe clean2
    // the LOSSY double corruption (FFFD inside) is left untouched
    // rather than half-repaired
    fix(corrupt(corrupt(clean))) shouldBe corrupt(corrupt(clean))
    // identity on ASCII, on CLEAN accented text, and on a lone
    // marker that is not actually mojibake (invalid UTF-8 bytes)
    fix("plain ascii") shouldBe "plain ascii"
    fix(clean) shouldBe clean
    fix("Ã alone") shouldBe "Ã alone"
    // NULL propagates
    Seq(Tuple1(null: String)).toDF("t")
      .select(Scrub.fixMojibake(col("t")).as("c"))
      .collect().head.isNullAt(0) shouldBe true
  }

  "canonicalizeUrl" should "fold fragments, tracking params and authority case" in {
    def canon(s: String): String =
      Seq(Tuple1(s)).toDF("u")
        .select(Scrub.canonicalizeUrl(col("u")).as("c"))
        .collect().head.getString(0)
    canon("HTTPS://Site.COM/A/b?utm_source=x#frag") shouldBe
      "https://site.com/A/b"                       // path case KEPT
    canon("https://s.com/p?utm_a=1&utm_b=2&x=1") shouldBe "https://s.com/p?x=1"
    canon("https://s.com/p?a=1&fbclid=zz") shouldBe "https://s.com/p?a=1"
    canon("https://s.com/p?gclid=3") shouldBe "https://s.com/p"
    canon("http://s.com/p?a=1&b=2") shouldBe "http://s.com/p?a=1&b=2" // untouched
    // the same page in three dresses collides on one key
    Seq("https://S.com/x?utm_c=1", "HTTPS://s.COM/x#top", "https://s.com/x")
      .map(canon).distinct should have size 1
    // non-URLs pass through (minus query/fragment handling)
    canon("not a url") shouldBe "not a url"
  }
}
