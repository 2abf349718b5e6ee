package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII scrubbing for training corpora: regex redaction of emails, IPv4
  * addresses and phone-like digit runs, with per-document redaction
  * counts — the standard pre-training privacy pass (the C4/refined-web
  * style pipeline step).
  *
  * Every pattern is written in the common subset of Java regex and RE2
  * (no lookaround, no backreferences), so an external engine replays
  * the exact same redactions — the DuckDB CORRECTNESS oracle does, with
  * `regexp_replace(..., 'g')`.
  *
  * Scale shape: pure map-only column expressions (codegen'd
  * `regexp_replace`/`regexp_count` with constant patterns — compiled
  * once per task, not per row); scrubbing fuses into the scan and
  * shuffles nothing.
  *
  * Redaction order is load-bearing and mirrored by the counts: emails
  * first (their local parts may contain digit runs a later pattern
  * could half-match), then IPv4 (dots would otherwise split into
  * phone-like runs), then phones on the already-redacted text.
  */
object Scrub {

  /** Email addresses: local part, '@', dotted domain, ≥2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — no 0-255 range check, matching the
    * published curation filters' permissive form). */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Phone-like runs: optional '+' and '(', then ≥8 chars of digits,
    * spaces, parentheses and dashes, first and last being digits. */
  val PhoneRe = "\\+?\\(?[0-9][0-9()\\- ]{6,}[0-9]"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** `text` with emails, then IPv4s, then phone runs redacted. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      PhoneRe, PhoneTag)

  /** Redaction counts as struct{emails, ips, phones}; each pattern is
    * counted on the text the scrub chain actually applies it to. */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailRe, EmailTag)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, IpTag)
    struct(
      regexp_count(text, lit(EmailRe)).cast(LongType).as("emails"),
      regexp_count(afterEmail, lit(Ipv4Re)).cast(LongType).as("ips"),
      regexp_count(afterIp, lit(PhoneRe)).cast(LongType).as("phones"))
  }

  /** Convenience: `df` with `textCol` scrubbed in place plus
    * `pii_emails`/`pii_ips`/`pii_phones` count columns. */
  def scrubTable(df: DataFrame, textCol: String): DataFrame = {
    val c = piiCounts(col(textCol))
    df.withColumn("__pii", c)
      .withColumn(textCol, scrubPii(col(textCol)))
      .withColumn("pii_emails", col("__pii.emails"))
      .withColumn("pii_ips", col("__pii.ips"))
      .withColumn("pii_phones", col("__pii.phones"))
      .drop("__pii")
  }

  // ----- Unicode / whitespace cleaning -----

  /** Unicode normalization ([[graft.functions.TextCleanExprs]]) —
    * codegen'd, `isNormalized` fast path for ASCII-heavy corpora.
    * NFC for canonical composition (DuckDB-replayable via
    * `nfc_normalize`); NFKC additionally folds compatibility forms
    * (ﬁ→fi, ①→1, fullwidth→ASCII — no SQL replay, spec-tested). */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    graft.functions.TextCleanExprs.unicodeNormalize(text, form)

  /** Control characters to strip: C0 minus \t\n\r, plus DEL. In the
    * Java-regex/RE2 common subset like every pattern in this file. */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** The standard corpus text-cleaning recipe, each step a constant-
    * pattern codegen'd `regexp_replace` in the Java/RE2 common subset
    * so the whole chain replays externally:
    *   1. Unicode-normalize (`form`, default NFC);
    *   2. normalize line endings (\r\n and lone \r → \n);
    *   3. strip control characters (keep \n, \t);
    *   4. collapse space/tab runs to one space;
    *   5. trim spaces around newlines;
    *   6. cap consecutive newlines at two (paragraph break);
    *   7. trim.
    * Map-only; fuses into the scan. */
  /** The cleaning chain's (pattern, replacement) steps, shared by the
    * Column and SQL builders so the two can never diverge. */
  private[pipeline] val CleanSteps: Seq[(String, String)] = Seq(
    "\\r\\n?" -> "\n",
    ControlRe -> "",
    "[ \\t]+" -> " ",
    " *\\n *" -> "\n",
    "\\n{3,}" -> "\n\n")

  def cleanText(text: Column, form: String = "NFC"): Column =
    trim(CleanSteps.foldLeft(normalizeUnicode(text, form)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    })

  /** Convenience: `df` with `textCol` cleaned in place. */
  def cleanTable(df: DataFrame, textCol: String,
                 form: String = "NFC"): DataFrame =
    df.withColumn(textCol, cleanText(col(textCol), form))

  /** Web-corpus HTML stripping, regex-level (the C4-style pass — for
    * DOM-aware boilerplate removal bring a parser upstream; at 100 TB
    * the regex pass is the one that fuses into the scan):
    *   1. drop <script>/<style> elements WITH their contents
    *      ((?s) so contents may span lines; [^>]* tolerates
    *      attributes; \\b keeps <styled-div> out of it);
    *   2. drop comments (<!-- … -->, non-greedy);
    *   3. replace every remaining tag with a space (word boundary —
    *      `a<br>b` must not fuse into "ab");
    *   4. unescape the five predefined entities plus numeric decimal
    *      references (&#NNNN; via chr()-style decode is NOT regex-able
    *      portably, so only &amp; &lt; &gt; &quot; &#39;/&apos; — the
    *      ones that dominate real corpora; &amp; LAST so "&amp;lt;"
    *      stays "&lt;" text rather than becoming "<").
    * Compose with [[cleanText]] for whitespace/Unicode cleanup.
    * Java/RE2 common subset; externally replayable. */
  private[pipeline] val HtmlSteps: Seq[(String, String)] = Seq(
    "(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?s)</?[A-Za-z!][^>]*>" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&(#39|apos);" -> "'",
    "&amp;" -> "&")

  def stripHtml(text: Column): Column =
    HtmlSteps.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Convenience: `df` with `textCol` HTML-stripped then cleaned. */
  def stripHtmlTable(df: DataFrame, textCol: String,
                     form: String = "NFC"): DataFrame =
    df.withColumn(textCol, cleanText(stripHtml(col(textCol)), form))

  /** ftfy-style mojibake repair ([[graft.functions.TextCleanExprs]]):
    * UTF-8 text mis-decoded as windows-1252 — possibly twice — is
    * restored ("cafÃ©" → "café", "â€™" → "’"). Conservative and
    * deterministic: repairs only marker-bearing strings, accepts a
    * step only when the marker count strictly drops and the
    * round-trip is lossless, so clean accented text never degrades.
    * Codegen'd; map-only. */
  def fixMojibake(text: Column): Column =
    graft.functions.TextCleanExprs.fixMojibake(text)

  /** Tracking query parameters stripped by [[canonicalizeUrl]]. */
  val TrackingParamRe = "(utm_[A-Za-z0-9_]+|fbclid|gclid|mc_eid|ref_src)"

  /** URL canonicalization for dedup/join keys — the same page under
    * `HTTPS://Site.com/a?utm_source=x#frag` and `https://site.com/a`
    * must collide. Steps, all in the Java/RE2 common subset with
    * CONSTANT replacements (capture-group replacement syntax differs
    * between Java `$1` and RE2 `\1`, so none is used):
    *   1. drop the fragment;
    *   2. drop tracking params — non-first (`&k=v`), first-with-
    *      successor (`?k=v&` → `?`), and lone (`?k=v` at end);
    *   3. lowercase the scheme+authority (extract → lower → re-concat;
    *      paths stay case-SENSITIVE per RFC 3986);
    *   4. drop a bare trailing `?`.
    * Deliberately NOT done: default-port stripping and trailing-slash
    * folding (both need capture replacements or change semantics).
    * Map-only; portable. */
  private[pipeline] val UrlSteps: Seq[(String, String)] = Seq(
    "#.*" -> "",
    ("&" + TrackingParamRe + "=[^&#]*") -> "",
    ("\\?" + TrackingParamRe + "=[^&#]*&") -> "?",
    ("\\?" + TrackingParamRe + "=[^&#]*$") -> "",
    "\\?$" -> "")

  private[pipeline] val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  def canonicalizeUrl(url: Column): Column = {
    val stripped = UrlSteps.foldLeft(url) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    // non-URL strings (no scheme://authority) pass through unchanged
    // apart from the query/fragment steps: the authority extracts as ''
    concat(lower(regexp_extract(stripped, AuthorityRe, 0)),
      regexp_replace(stripped, AuthorityRe, ""))
  }

  // ----- direct Catalyst forms for the SQL function registry -----
  // The registry needs RESOLVED expression trees (a Column built from
  // unresolved function nodes cannot re-enter analysis from inside a
  // FunctionBuilder); these mirror the Column forms over the SAME step
  // tables, and ScrubSpec pins SQL ≡ Column on adversarial inputs.

  import org.apache.spark.sql.catalyst.expressions.{Concat => CConcat,
    Expression, Literal => CLit, Lower => CLower,
    RegExpExtract => CExtract, RegExpReplace => CReplace,
    StringTrim => CTrim}

  private def foldSteps(e: Expression, steps: Seq[(String, String)]): Expression =
    steps.foldLeft(e) { case (c, (p, r)) => CReplace(c, CLit(p), CLit(r)) }

  private[graft] def cleanTextExpr(e: Expression): Expression =
    CTrim(foldSteps(
      graft.functions.TextCleanExprs.UnicodeNormalizeExpr(e, "NFC"),
      CleanSteps))

  private[graft] def stripHtmlExpr(e: Expression): Expression =
    foldSteps(e, HtmlSteps)

  private[graft] def canonicalizeUrlExpr(e: Expression): Expression = {
    val stripped = foldSteps(e, UrlSteps)
    CConcat(Seq(
      CLower(CExtract(stripped, CLit(AuthorityRe), CLit(0))),
      CReplace(stripped, CLit(AuthorityRe), CLit(""))))
  }

  /** Host component of a URL, lowercased — the curation KEY for
    * per-domain caps and host-level stratification (the
    * C4/RefinedWeb discipline: cap or dedup per registered host so a
    * single boilerplate-heavy domain cannot dominate a stratum):
    * authority minus userinfo and port. Non-URL strings extract as
    * `''` (one shared "no host" group — cap that group too, or filter
    * it, but never crash on dirty rows). Same-regex replayable in any
    * RE2/Java engine. */
  private[graft] val HostRe =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"

  def urlHost(url: Column): Column =
    lower(regexp_extract(url, HostRe, 1))

  private[graft] def urlHostExpr(e: Expression): Expression =
    CLower(CExtract(e, CLit(HostRe), CLit(1)))
}
