package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Top-k terms per document by tf-idf — the classic text-relational
    * pipeline: tokenize (map) → tf per (doc, term) → df per term derived
    * FROM tf (tf rows are already distinct (doc, term) pairs, so df is a
    * plain count — the corpus is exploded once and the two-phase
    * countDistinct agg disappears) → idf join → per-doc top-k window.
    *
    * Scale shape: the corpus-size scalar ships as a broadcast (one-row
    * cross join, no collect); the df join stays a shuffle join rather
    * than a count-over-window so AQE skew handling can split hot terms
    * ("the") that a term-partitioned window would pin to one task; the
    * per-doc window is bounded by a doc's distinct terms, never
    * corpus-wide; scores are rounded before ranking so cross-engine ulp
    * noise in `ln` cannot flip the order (ties then break on term).
    * Tokenization is lower + split on non-alphanumeric — chosen because
    * it is expressible identically in ANSI SQL, keeping the operator
    * DuckDB-oracleable. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    tf.join(docFreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("rnk"))
  }

  /** Sliding-window document chunking — the RAG/context-window prep step:
    * split each document into `window`-token chunks every `stride` tokens
    * (overlap = window − stride), chunk i covering tokens
    * [i·stride, i·stride + window). ceil(n/stride) chunks per doc; the
    * last may be short. Map-side only (explode of a per-row sequence —
    * the same in-task amplification shape as interval expansion and
    * Mixing.replicate: nothing wide materializes at any corpus size),
    * and pure built-in expressions (split/slice/array_join), so it is
    * exactly expressible in ANSI SQL and DuckDB-oracleable.
    *
    * Returns (id, chunk_idx, start_tok, n_tok, chunk_text). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = tokens(col(textCol))
    val n = size(toks)
    docs
      .select(col(idCol), toks.as("_toks"), n.as("_n"))
      // chunks exist while i*stride < n → last index floor((n-1)/stride).
      // The n=0 guard matters: sequence(0, -1) is Spark's DESCENDING
      // sequence [0, -1], which would emit two bogus chunks (chunk_idx -1,
      // negative start_tok). split() never returns an empty array for
      // non-null text so n>=1 today, but this op is public — guard
      // explicitly rather than rely on that; explode(NULL) emits nothing.
      .withColumn("chunk_idx",
        explode(when(col("_n") >= 1,
          sequence(lit(0), floor((col("_n") - 1) / lit(stride)).cast("int")))))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("n_tok", least(lit(window), col("_n") - col("start_tok")))
      .withColumn("chunk_text",
        array_join(slice(col("_toks"), col("start_tok") + 1, lit(window)), " "))
      .drop("_toks", "_n")
  }

  /** Per-document repetition score: the fraction of character n-gram
    * occurrences that repeat an already-seen n-gram (1 - distinct/total).
    * Boilerplate, template spam, and degenerate generation loops score
    * high; natural prose scores low — a cheap single-pass quality filter
    * for training-corpus curation. Map-only (no shuffle): each row is
    * scored from its own text. */
  def repetition(text: Column, n: Int): (Column, Column, Column) = {
    val total = greatest(length(text) - (n - 1), lit(1))
    val uniq = size(Dedup.shingles(text, n))
    val ratio = round(lit(1.0) - uniq.cast("double") / total, 6)
    (total, uniq, ratio)
  }

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
