package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{SubstringSetCount, TokenInSetCount, WhitespaceTokenCount}

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  * Everything is Spark built-ins (codegen'd, no UDFs) so the whole stage
  * stays inside WholeStageCodegen at 100 TB scan scale.
  */
object TextAnalysis {

  /** Whitespace token count (single-space tokenizer matches the DuckDB
    * oracle exactly; use [[tokenCountRegex]] for multi-whitespace). */
  def tokenCount(text: Column): Column = size(split(text, " ", -1))

  /** Regex token count over arbitrary whitespace runs. */
  def tokenCountRegex(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count approximation: words + digit runs +
    * punctuation marks counted separately (a cheap stand-in for a real
    * tokenizer's token count, linear scan, no vocabulary). */
  def subwordCountApprox(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))) +
      regexp_count(text, lit("[0-9]+"))

  /** Punctuation ratio: punct chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text))

  /** Mean word length in characters — pure length arithmetic
    * (Σ token chars = total chars − whitespace chars), no per-token
    * lambda, stays inside whole-stage codegen. */
  def meanWordLen(text: Column): Column = {
    val nToks = WhitespaceTokenCount(text)
    when(nToks === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "\\s", "")).cast("double") / nToks)
  }

  /** Gopher-style repetition signal: fraction of raw '\n'-separated
    * lines that are duplicates of another line (1 − distinct/total).
    * Pure array arithmetic, no per-line lambda. Single-line (or empty)
    * text scores 0. */
  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n", -1)
    (size(lines) - size(array_distinct(lines))).cast("double") / size(lines)
  }

  /** Gopher-style repetition signal: fraction of all word n-gram
    * occurrences taken by the most frequent n-gram (native one-pass
    * [[graft.functions.NgramModeFraction]]; heavily repetitive docs
    * score near 1). */
  def topNgramFraction(text: Column, n: Int = 2): Column =
    graft.functions.NgramModeFraction(text, n)

  /** Stopword hit ratio against a wordlist (default: English) — one
    * native byte pass per side ([[WhitespaceTokenCount]] denominator,
    * [[TokenInSetCount]] numerator), no interpreted HOF lambdas. */
  def stopwordRatio(
      text: Column,
      stopwords: Seq[String] = EnglishStopwords): Column = {
    val nToks = WhitespaceTokenCount(text)
    when(nToks === 0, lit(0.0)).otherwise(
      TokenInSetCount(lower(text), stopwords, whitespaceRuns = true)
        .cast("double") / nToks)
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be")

  /** Composite quality score ∈ [0,1]: length band + low punctuation +
    * stopword presence (heuristics standard in pretraining-data filters).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCountRegex(text)
    val lengthOk = when(toks.between(5, 100000), lit(1.0)).otherwise(lit(0.0))
    val punctOk = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopOk = least(stopwordRatio(text) * 5.0, lit(1.0))
    round((lengthOk + punctOk + stopOk) / 3.0, 6)
  }

  /** n-gram marker-wordlist language ID: score each candidate language
    * by marker-token hits, pick the argmax (ties → lexicographic). A
    * standard cheap heuristic; markers are configurable.
    */
  def langId(
      text: Column,
      markers: Map[String, Seq[String]] = DefaultLangMarkers): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        TokenInSetCount(lower(text), words, whitespaceRuns = true).as("score"),
        lit(lang).as("lang"))
    }
    // argmax over the ascending-sorted language list with a strict `>`:
    // on ties the earlier (alphabetically FIRST) language is kept
    val best = scored.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    best.getField("lang")
  }

  val DefaultLangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "es" -> Seq("el", "la", "los", "que", "es", "una", "con"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Char-n-gram profile language ID — the substring-frequency variant
    * of [[langId]] (the classic Cavnar–Trenkle-style heuristic reduced
    * to fixed per-language profiles): score each candidate language by
    * total non-overlapping occurrences of its characteristic character
    * n-grams anywhere in the text (so "sch" scores inside "deutsche",
    * where a word-marker list sees nothing), argmax with the same
    * alphabetically-first tie-break as [[langId]]. One codegen'd byte
    * pass per language over the scan ([[graft.functions.SubstringSetCount]]);
    * per-pattern counts equal `(len(s) − len(replace(s, p, ''))) / len(p)`,
    * so a SQL oracle replays the score exactly.
    */
  def langIdNgram(
      text: Column,
      profiles: Map[String, Seq[String]] = DefaultLangNgrams): Column = {
    val t = lower(text)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      struct(SubstringSetCount(t, grams).as("score"), lit(lang).as("lang"))
    }
    val best = scored.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    best.getField("lang")
  }

  /** Characteristic character n-grams per language (substring-level, so
    * they fire inside inflected/compound words; includes space-anchored
    * grams for function words and single CJK chars for zh). */
  val DefaultLangNgrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "ing", "and", " of", " is"),
    "de" -> Seq("der", "sch", "ich", "ein", "und"),
    "es" -> Seq(" el", "que", " la", "los", "ción"),
    "fr" -> Seq(" le", "les", "des", "une", "aux"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Deterministic document fingerprint (md5 of normalized text) — the
    * exact-dedup key. md5 is identical across engines, so oracles hold.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** 64-bit rolling-style content hash (xxhash64 of normalized text) —
    * cheaper than md5 when cross-engine comparability isn't needed. */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))
}
