package graft.pipeline

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text normalization for corpus cleaning: Unicode canonicalization,
 * accent stripping, whitespace/punctuation cleanup. All per-row scalar
 * work (no shuffle, trivially data-parallel at 100 TB); the regex pieces
 * are Spark built-ins (codegen'd), the Unicode pieces are thin native
 * expressions over `java.text.Normalizer` — the same Unicode
 * normalization algorithm utf8proc implements, so DuckDB's
 * `nfc_normalize`/`strip_accents` reproduce them bit-exactly.
 */
object NormHelper {
  private val formOf = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  def form(name: String): Normalizer.Form =
    formOf.getOrElse(name.toUpperCase,
      throw new IllegalArgumentException(
        s"unknown normalization form '$name' (expected NFC/NFD/NFKC/NFKD)"))

  def normalize(s: UTF8String, f: Normalizer.Form): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, f))

  private val Marks = "\\p{M}+".r
  /** NFD-decompose, drop combining marks — 'Café' -> 'Cafe'. */
  def stripAccents(s: UTF8String): UTF8String =
    UTF8String.fromString(
      Marks.replaceAllIn(Normalizer.normalize(s.toString, Normalizer.Form.NFD), ""))
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column. */
case class UnicodeNorm(child: Expression, formName: String) extends UnaryExpression {
  override def prettyName: String = "pl_unicode_normalize"
  override def dataType: DataType = StringType
  @transient private lazy val f = NormHelper.form(formName)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      // surface a bad form name as an analysis error, not a task failure
      try { NormHelper.form(formName); TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage) }
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string argument")
  }
  override def nullSafeEval(input: Any): Any =
    NormHelper.normalize(input.asInstanceOf[UTF8String], f)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val fRef = ctx.addReferenceObj("normForm", f, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, c => s"graft.pipeline.NormHelper.normalize($c, $fRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Accent/diacritic removal (NFD + drop combining marks). */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def prettyName: String = "pl_strip_accents"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string argument")
  }
  override def nullSafeEval(input: Any): Any =
    NormHelper.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.NormHelper.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-level normalization surface. */
object TextNorm {
  import graft.expressions.{asColumn => c, asExpr}

  def nfc(text: Column): Column = c(UnicodeNorm(asExpr(text), "NFC"))
  def nfkc(text: Column): Column = c(UnicodeNorm(asExpr(text), "NFKC"))
  def unicode_normalize(text: Column, form: String): Column =
    c(UnicodeNorm(asExpr(text), form))
  def strip_accents(text: Column): Column = c(StripAccents(asExpr(text)))

  /** Collapse runs of whitespace to single spaces and trim the ends. */
  def normalize_whitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Drop everything but letters, digits, and whitespace. */
  def strip_punct(text: Column): Column =
    regexp_replace(text, "[^\\p{L}\\p{N}\\s]", "")

  /** Canonical cleaning pass: NFC, lowercase, whitespace collapse. */
  def clean(text: Column): Column = normalize_whitespace(lower(nfc(text)))

  /** Canonicalize a URL for dedup keys — the standard web-corpus
    * normalization (strip the #fragment; trim; lowercase scheme+host,
    * preserving path/query case; strip the default :80/:443 port; strip
    * one trailing slash). Built-in regexp/string functions only, each
    * step anchored so the whole chain stays codegen'd and has an exact
    * RE2 twin in the DuckDB oracle (no lookarounds). Malformed or
    * scheme-less strings pass through the steps unchanged where they
    * don't match — normalization never throws. */
  def normalize_url(url: Column): Column = {
    val noFrag = trim(regexp_replace(url, "(?s)#.*$", ""))
    val schemeHost = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*", "")
    val lowered = when(schemeHost === "", noFrag)
      .otherwise(concat(schemeHost, rest))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]*):80((/|\\?|#).*)?$", "$1$2"),
      "^(https://[^/:?#]*):443((/|\\?|#).*)?$", "$1$2")
    regexp_replace(noPort, "/$", "")
  }

  /** Host of a URL: the authority between `scheme://` and the first
    * `/ ? #`, lowercased, with any `:port` stripped; empty string for
    * scheme-less input. Anchored regexp only — codegen'd, with an exact
    * RE2 twin in DuckDB. */
  def url_host(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]*)", 1))

  /** Registered domain approximation: the last two dot-labels of
    * [[url_host]] (`www.example.com` → `example.com`) — the per-domain
    * cap key of web-corpus curation (RefinedWeb). Single-label hosts
    * (e.g. `localhost`) pass through whole. NOT public-suffix-aware: a
    * `*.co.uk` host returns `co.uk`; thread a real PSL table through a
    * join when that matters. */
  def url_domain(url: Column): Column = {
    val h = url_host(url)
    val last2 = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(last2 === "", h).otherwise(last2)
  }

  /** Line-level boilerplate cleanup — the C4-style per-line pass that
    * runs between HTML stripping and document-level quality filters.
    * Splits on newlines and keeps a line iff, after trimming:
    *  - it has at least `minWords` whitespace-separated words,
    *  - its lowercase form contains none of `stopMarkers` (nav/footer
    *    noise like "javascript", "cookie", "all rights reserved"),
    *  - with `requireTerminal`, it ends in terminal punctuation
    *    (`. ! ? " '` — the C4 rule).
    * Kept lines are re-joined trimmed. Built-in higher-order array
    * functions only (codegen'd, per-row scalar — no shuffle), each with
    * an exact DuckDB list-function twin (q_clean_lines). */
  def clean_lines(text: Column, minWords: Int = 3,
      stopMarkers: Seq[String] = Seq("javascript", "cookie",
        "all rights reserved"),
      requireTerminal: Boolean = false): Column = {
    def keep(l: Column): Column = {
      val t = trim(l)
      val words = size(filter(split(t, " "), w => w =!= ""))
      val noMarker = stopMarkers.foldLeft(lit(true)) {
        (acc, m) => acc && !lower(t).contains(m)
      }
      val terminal =
        if (requireTerminal) t.rlike("[.!?\"']$") else lit(true)
      words >= minWords && noMarker && terminal
    }
    array_join(transform(filter(split(text, "\n"), keep _), l => trim(l)), "\n")
  }

  /** The kept-line count of [[clean_lines]] under the same rules —
    * pair with `size(split(text, '\n'))` for a kept/total ratio. */
  def kept_lines(text: Column, minWords: Int = 3,
      stopMarkers: Seq[String] = Seq("javascript", "cookie",
        "all rights reserved"),
      requireTerminal: Boolean = false): Column = {
    val cleaned = clean_lines(text, minWords, stopMarkers, requireTerminal)
    when(cleaned === "", 0).otherwise(size(split(cleaned, "\n")))
  }

  /** Drop HTML/XML tags and comments, then decode the predefined XML
    * entities plus nbsp — the text-extraction step of a web-corpus
    * pipeline. Tags become spaces (so adjacent text doesn't fuse);
    * `&amp;` decodes LAST so `&amp;lt;` yields the literal `&lt;`
    * rather than double-decoding. Regex + literal replaces only, all
    * dialect-neutral. */
  def strip_html(text: Column): Column = {
    val noComments = regexp_replace(text, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    ent.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
  }
}
