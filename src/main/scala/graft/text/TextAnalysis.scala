package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale training-data pipelines: token
  * counting, quality scoring, n-gram language ID, document fingerprinting.
  *
  * All builders are pure `Column` expressions over built-in (codegen'd)
  * functions — no UDFs — so they stay inside WholeStageCodegen and scale
  * linearly with the scan. Regex-based counters use patterns portable
  * between Java regex (Spark) and RE2 (DuckDB oracle).
  */
object TextAnalysis {

  /** Whitespace-token count: number of maximal \S+ runs. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-style pre-tokenizer pattern (GPT-2 family, lookahead-free so it
    * runs identically under Java regex and RE2): contraction suffixes,
    * space-prefixed letter runs, space-prefixed digit runs, space-prefixed
    * punctuation runs, residual whitespace. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** BPE-ish token count — the pre-tokenization segment count a BPE
    * tokenizer would start from (upper bound on merged-token count). */
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Count of alphabetic characters. */
  def alphaCount(text: Column): Column = regexp_count(text, lit("[a-z]"))

  /** Hits of any word in `words` (case-sensitive; lower() upstream). */
  def wordHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit("\\b(" + words.mkString("|") + ")\\b"))

  /** Tiny per-language stopword lists for the n-gram language-ID heuristic.
    * Order is the deterministic tie-break precedence. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo", "you"))

  /** Language-ID by stopword-hit argmax with fixed precedence on ties. */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (lang, words) => lang -> wordHits(text, words) }
    scores.zipWithIndex.foldRight(lit(LangStopwords.last._1)) {
      case (((lang, score), i), elseCol) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        val isMax = laterScores.foldLeft(lit(true))((acc, other) => acc && score >= other)
        when(isMax, lit(lang)).otherwise(elseCol)
    }
  }

  /** Mean token length = alpha chars / tokens (this corpus has no
    * punctuation, so alpha ≈ non-space). */
  def avgTokenLen(text: Column): Column =
    alphaCount(text).cast("double") / tokenCount(text)

  /** Stopword fraction of tokens (English list). */
  def stopwordRatio(text: Column): Column =
    wordHits(text, LangStopwords.head._2).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: stopword presence + length band.
    * Deliberately simple and branch-free; weights are part of the spec. */
  def qualityScore(text: Column): Column =
    round(
      stopwordRatio(text) * lit(0.5) +
        least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) * lit(0.5),
      6)

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text. Exact-dedup key robust to formatting noise. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** PII patterns for pre-training scrubbing (lookahead-free so they run
    * identically under Java regex and RE2). Deliberately high-recall /
    * low-precision — redacting a false positive costs a token, leaking a
    * true positive costs an incident. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Phone/ID-like digit runs: 9+ chars of digits with common separators,
    * digit-anchored on both ends, optional leading +. */
  val PhoneRe = "\\+?\\d[\\d\\s().-]{7,}\\d"

  /** Redact emails, IPv4 addresses and phone/ID-like digit runs with typed
    * placeholders. Order matters and is part of the spec: emails first
    * (their local part may contain digits), then IPs (dotted digit runs
    * would otherwise be eaten as "phones"), then the digit-run catch-all.
    * Pure codegen'd regexp_replace chain — scales with the scan like every
    * other builder here. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Per-class PII hit counts (for scrub-rate reporting on data cards).
    * Counted on the same precedence chain as [[redactPii]], so a dotted
    * quad counts as one IP, not also a phone. */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "[IP]")
    struct(
      regexp_count(text, lit(EmailRe)).as("n_email"),
      regexp_count(afterEmail, lit(Ipv4Re)).as("n_ip"),
      regexp_count(afterIp, lit(PhoneRe)).as("n_phone"))
  }
}
