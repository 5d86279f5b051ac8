package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: token counting,
  * quality scoring, language-ID heuristics, document fingerprinting.
  * All pure Column expressions (codegen'd, no UDFs) — they run inside the
  * scan's whole-stage-codegen pipeline at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexical tokens: letter runs, digit runs, single punctuation. */
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Deterministic polynomial rolling hash over whitespace tokens
    * (per-token key = 17*len + first-char code), mod 1e9+7. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => length(t) * 17 + ascii(t)),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Stopword-overlap score against a marker vocabulary (distinct matches). */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(array_intersect(toks, array(markers.map(lit): _*)))

  /** Language-marker sets (tiny, heuristic — the operator shape is the
    * point; swap in real stopword tables for production use). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Predicted language: argmax of marker scores, fixed precedence order on
    * ties (earlier entry in [[langMarkers]] wins). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (l, m) => l -> markerScore(toks, m) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }
}
