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

  /** Per-document unigram-LM pseudo-perplexity — the CCNet-style corpus
    * quality signal: score each document by the mean negative
    * log-likelihood (NLL, nats/token) of its tokens under a unigram
    * language model estimated from the corpus itself. Common boilerplate
    * scores low (head), rare-token noise scores high (tail); bucketing on
    * the score is the classic head/middle/tail curation split.
    *
    * Scale shape at 100 TB:
    *  - The LM is ONE hash aggregate over the exploded token stream
    *    (map-side partials: the shuffle carries a row per (task, term),
    *    never per token) plus a one-row total that ships as a broadcast
    *    (crossJoin(broadcast) — no collect).
    *  - Scoring joins the exploded tokens against the BROADCAST LM —
    *    map-side, so the hot terms ("the") that would wreck a shuffle
    *    join on `term` never shuffle at all. Natural-language vocabulary
    *    is Zipf-bounded, but at open-web scale cap it with a min-count
    *    threshold and score out-of-vocabulary tokens at a floor
    *    probability — the standard smoothing — to keep the broadcast
    *    bounded.
    *  - The per-doc aggregate collapses map-side too: a document's
    *    tokens are co-located after the narrow explode, so the partial
    *    aggregation reduces to ~one row per document before the shuffle.
    *
    * Numeric determinism: per-token NLL is quantized to integer
    * MICRO-NATS (floor(-ln(p)·1e6 + 0.5)) BEFORE aggregation, so the
    * per-doc sum is exact long arithmetic — order-independent, immune to
    * the cross-engine FP-summation-order divergence that an avg(double)
    * would reintroduce (the q_window_distribution lesson). The final
    * per-doc mean divides two integers and floors once — a fixed IEEE
    * op sequence both engines reproduce bit-identically; only ln itself
    * can vary (by ≤1 ulp, same validated class as tf-idf's ln).
    *
    * Returns (doc_id, n_tok, nll) with nll rounded to 6 decimals.
    *
    * `minCount` is the vocabulary cap that keeps the broadcast bounded at
    * open-web scale: terms rarer than it are PRUNED from the LM (Zipf:
    * the long tail is most of the vocabulary but almost none of the
    * token mass) and score at the floor probability minCount/total — an
    * upper bound on any pruned term's true probability, so capping can
    * only soften, never exaggerate, a rare-token penalty. minCount = 1
    * (the default) is the exact uncapped model. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
    val lm = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val total = toks.agg(count(lit(1)).as("total"))
    def microNll(cnt: Column, tot: Column): Column =
      floor(-log(cnt.cast("double") / tot) * 1000000d + 0.5d).cast("long")
    toks
      .join(broadcast(lm), Seq("term"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__q",
        microNll(coalesce(col("cnt"), lit(minCount)), col("total")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("__q").as("__sq"))
      .select(col("doc_id"), col("n_tok"),
        (floor(col("__sq").cast("double") / col("n_tok") + 0.5d) / 1000000d)
          .as("nll"))
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
