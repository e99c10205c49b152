package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language ID, quality scoring — all composed from
  * built-in (codegen'd) functions so they run inside whole-stage codegen
  * and are expressible 1:1 in ANSI SQL for the DuckDB oracle.
  *
  * Outputs are INTEGER-valued wherever a score is produced: float-free
  * results hash identically across engines.
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token estimate: GPT-2-style pretokenizer pattern match count
    * (contractions | space?letters | space?digits | space?punct-run). */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+"
  def tokenCountBpe(text: Column): Column =
    coalesce(regexp_count(text, lit(BpePattern)), lit(0))

  /** Stopword tables for the n-gram language-ID heuristic (word-boundary
    * regexes; CJK detected by codepoint range). */
  val LangStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|for)\\b",
    "es" -> "\\b(el|la|de|que|y|en|los|una)\\b",
    "fr" -> "\\b(le|les|des|et|un|une|du|est)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|zu|nicht)\\b")
  val CjkPattern: String = "[一-鿿]"

  def stopwordHits(text: Column, lang: String): Column = {
    val pat = LangStopwords.toMap.apply(lang)
    coalesce(regexp_count(lower(text), lit(pat)), lit(0))
  }

  /** Heuristic language ID → one of en/es/fr/de/zh/unknown. Deterministic
    * tie-break: the fixed order en > es > fr > de. */
  def langId(text: Column): Column = {
    val zh = coalesce(regexp_count(text, lit(CjkPattern)), lit(0))
    val en = stopwordHits(text, "en")
    val es = stopwordHits(text, "es")
    val fr = stopwordHits(text, "fr")
    val de = stopwordHits(text, "de")
    when(zh >= greatest(en, es, fr, de) && zh > 0, "zh")
      .when(en >= greatest(es, fr, de) && en > 0, "en")
      .when(es >= greatest(fr, de) && es > 0, "es")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("unknown")
  }

  /** Integer quality score 0..100: four 25-point gates —
    * length in [50, 10000], ≥10 words, avg word length in [3, 12],
    * ≥70% alphanumeric-or-space characters. */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val words = tokenCount(text)
    val avgWord = when(words > 0, len.cast("long") / words).otherwise(lit(0L))
    val alnum = coalesce(regexp_count(text, lit("[a-zA-Z0-9 ]")), lit(0))
    val alnumPct = when(len > 0, alnum * 100L / len).otherwise(lit(0L))
    val g1 = when(len >= 50 && len <= 10000, 25).otherwise(0)
    val g2 = when(words >= 10, 25).otherwise(0)
    val g3 = when(avgWord >= 3 && avgWord <= 12, 25).otherwise(0)
    val g4 = when(alnumPct >= 70, 25).otherwise(0)
    (g1 + g2 + g3 + g4).cast("int")
  }
}
