package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Tools

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Everything is pure Column arithmetic (codegen'd, no UDF) so the same
  * logic is expressible 1:1 in the DuckDB oracle and runs at scan speed
  * over 100 TB.
  */
object TextAnalysis {

  // ----------------------------------------------------------- counting
  /** Whitespace token count; blank → 0. */
  def tokenCount(c: Column): Column = size(Tools.tokenize(c))

  /** A BPE-ish subword count heuristic: alphanumeric runs + individual
    * non-space punctuation marks (approximates tokenizer token counts
    * without a vocab). RE2-compatible pattern — no lookarounds — so the
    * identical regex runs in the DuckDB oracle. */
  val subwordPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit(subwordPattern), lit(0)))

  // ------------------------------------------------------------ quality
  /** Ratio of punctuation chars to total chars (0 for empty). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      (length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double") /
        length(c).cast("double"))

  /** Ratio of uppercase letters to total chars (0 for empty). */
  def upperRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      (length(c) - length(regexp_replace(c, "[A-Z]", ""))).cast("double") /
        length(c).cast("double"))

  /** Mean word length over whitespace tokens (0 when no tokens). */
  def meanWordLen(c: Column): Column = {
    val toks = Tools.tokenize(c)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Stopword hit ratio: fraction of tokens that are in the given
    * stopword list. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = Tools.tokenize(lower(c))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation density and some stopwords (C4/Gopher-style heuristic
    * rules, simplified). */
  def qualityScore(c: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val punct = punctRatio(c)
    val sw = stopwordRatio(c, stopwords)
    round(greatest(lit(0.0),
      lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - least(punct * 5, lit(1.0))) +
        lit(0.3) * least(sw * 4, lit(1.0))), 4)
  }

  // ------------------------------------------------------------- lang id
  /** Stopword vocabularies for the five testdata languages. Tiny on
    * purpose: the heuristic is distinct-stopword voting, not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"))

  /** Language-ID heuristic: CJK chars → zh; else the language with the
    * most distinct stopword hits, ties broken in fixed order
    * en > fr > es > de (deterministic, oracle-expressible). */
  def langId(c: Column): Column = {
    val toks = array_distinct(Tools.tokenize(lower(c)))
    def hits(lang: String): Column =
      size(array_intersect(toks, array(stopwords(lang).map(lit): _*)))
    val (en, fr, es, de) = (hits("en"), hits("fr"), hits("es"), hits("de"))
    // NULL text: every when-condition is null → would fall through to
    // the otherwise branch and count missing docs as German
    when(c.isNull, lit(null).cast("string"))
      .when(c.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .when(en >= fr && en >= es && en >= de, lit("en"))
      .when(fr >= es && fr >= de, lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }
}
