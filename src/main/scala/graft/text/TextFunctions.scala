package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus processing:
  * tokenization, shingling, language-ID heuristics, quality scoring,
  * fingerprinting. Everything is a Catalyst expression (codegen-friendly,
  * no UDFs) so it runs inside the scan stage — at 100 TB these are
  * map-only operations with zero shuffle.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings removed. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Raw whitespace split (keeps empties) — the shingling base, kept
    * bit-compatible with the SQL oracle's string_split. */
  def rawTokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** BPE-ish subword count: greedy runs of ≤4 letters / digits / other. */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9\\s]"))

  /** Word n-gram shingles (distinct), the MinHash/Jaccard unit — native
    * single-pass expression (empty array below n tokens). */
  def shingles(text: Column, n: Int): Column =
    graft.expressions.TextExpressions.wordShingles(text, n)

  /** HOF reference implementation of [[shingles]] (differential tests
    * only — 100× slower, and re-evaluated per consumer branch). */
  def shinglesHof(text: Column, n: Int): Column = {
    val toks = rawTokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  private val stopwords = Seq("the", "a", "and", "of", "to")

  /** Stopword ratio over non-empty tokens (0 when the doc is empty) —
    * native single-pass expression, value-identical to
    * [[stopwordRatioHof]]. Null text → null ratio (SQL convention,
    * matching [[qualityScore]]'s null contract). */
  def stopwordRatio(text: Column): Column =
    graft.expressions.StopwordRatioExpression
      .stopwordRatioRaw(text, stopwords)

  /** HOF reference implementation of [[stopwordRatio]] (differential
    * tests only). Null-in-null-out like the native expression (the bare
    * `otherwise(0.0)` would score null text as 0 instead of null). */
  def stopwordRatioHof(text: Column): Column = {
    val toks = tokens(text)
    when(text.isNull, lit(null).cast("double"))
      .otherwise(when(size(toks) > 0,
        size(filter(toks, t => t.isin(stopwords: _*))) / size(toks))
        .otherwise(lit(0.0)))
  }

  /** Crude language guess: corpora dominated by English function words
    * score high; everything else is "other". (A production system would
    * use char-n-gram profiles per language; the *shape* — pure map-side
    * classification — is the same.) */
  def langIdGuess(text: Column): Column =
    when(stopwordRatio(text) > 0.12, lit("en_like")).otherwise(lit("other"))

  /** Mean token length (0 for empty docs). */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
        .cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: lexical diversity + length signals.
    * Fixed operand order so the double arithmetic is reproducible in SQL.
    * Native single-pass expression; the rounding stays Spark's builtin
    * `round` so the value is identical to [[qualityScoreHof]] and the
    * DuckDB oracle.
    *
    * NULL CONTRACT (both twins): null text or null n_chars → null score
    * (SQL convention, `nullSafeEval` on the native side). A null-text
    * doc therefore fails any `score >= τ` gate rather than receiving a
    * partial length-only score. */
  def qualityScore(text: Column, nChars: Column): Column =
    round(graft.expressions.QualityScoreExpression
      .qualityScoreRaw(text, nChars), 3)

  /** HOF reference implementation of [[qualityScore]] (differential
    * tests only — five nested interpreted lambdas, re-evaluated per
    * consumer branch). Null-in-null-out like the native expression:
    * without the guard, `otherwise(0.0)` branches and `least(1.0, null)`
    * would hand a null-text doc a non-null partial score. */
  def qualityScoreHof(text: Column, nChars: Column): Column = {
    val toks = tokens(text)
    val distinctRatio = when(size(toks) > 0,
      size(array_distinct(toks)) / size(toks)).otherwise(lit(0.0))
    val lenScore = least(lit(1.0), nChars / lit(500.0))
    val tokScore = least(lit(1.0), meanTokenLength(text) / lit(8.0))
    when(text.isNull || nChars.isNull, lit(null).cast("double"))
      .otherwise(round(
        lit(0.3) * distinctRatio + lit(0.3) * lenScore + lit(0.4) * tokScore, 3))
  }

  /** Exact-dedup fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))
}
