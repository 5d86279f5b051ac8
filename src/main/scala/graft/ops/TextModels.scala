package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear text models for corpus curation — the classifier
  * tier of an LLM-data pipeline (CCNet/Gopher-style filtering uses
  * exactly these shapes: a cheap linear scorer over token statistics,
  * applied corpus-wide), built so every number is EXACT across engines
  * and therefore fully DuckDB-oracle-able despite being "ML":
  *
  *  - every transcendental (ln) is quantized to integer micro-nats
  *    IMMEDIATELY (floor(-ln(p)·10⁶ + 0.5), the q_text_perplexity move),
  *    so all aggregation is exact long arithmetic;
  *  - model parameters are vocab-sized aggregates (the compress-then-
  *    compute move: the corpus's running tokens collapse into a
  *    (word, class) count table once), broadcast to the scoring join —
  *    the token stream is never shuffled on a word key (Zipf-hot words
  *    would make that the most skewed shuffle in the corpus);
  *  - ties break deterministically (class ascending).
  *
  * Both operators train on the corpus they score (self-supervised from
  * a label column / indicator — the catalog-query form); a production
  * run fits on a curated sample and broadcasts the persisted model, the
  * same plan minus the fit subtree.
  */
object TextModels {

  /** floor(-ln(num/den)·10⁶ + 0.5) as BIGINT — one quantized negative
    * log. num/den must be exact-integer-valued columns; the division,
    * ln, and floor are bit-identical IEEE on Spark and DuckDB. */
  private def qNegLn(num: Column, den: Column): Column =
    floor(-log(num.cast("double") / den.cast("double")) * 1e6 + 0.5d)
      .cast("long")

  /** Multinomial Naive Bayes with Laplace (+1) smoothing, trained on
    * `labelCol` and applied to every document in one lazy plan.
    *
    * Model: q(w, l) = floor(-ln((cnt(w,l)+1)/(tot_l+V))·10⁶+0.5) over the
    * DENSE vocab × classes grid (absent (w,l) pairs get the smoothed
    * zero-count mass — without densification a word unseen in class l
    * would silently contribute 0 instead of its smoothing penalty),
    * plus the class prior qp(l) from document counts. A document's class
    * score is qp(l) + Σ_tokens q(w_i, l) (exact long sum); the
    * prediction is the minimum score, ties broken class-ascending.
    *
    * Scale shape: the model is V×|classes| rows (vocab-sized — Zipf
    * bounds V at tens of millions for 100 TB), built by ONE token-stream
    * aggregation and broadcast to the scoring join; scoring is a
    * map-side join + per-doc aggregation, never a token shuffle on the
    * word key. Returns (idCol, labelCol, pred_nb, nb_score_micro). */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), col(labelCol),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
    val vocab = toks.select("word").distinct()
    val vSize = vocab.agg(count(lit(1)).as("v_size"))
    val classes = docs.select(col(labelCol).as("hyp")).distinct()
    val cntWL = toks.groupBy(col("word"), col(labelCol).as("hyp"))
      .agg(count(lit(1)).as("c"))
    val totL = toks.groupBy(col(labelCol).as("hyp"))
      .agg(count(lit(1)).as("t"))
    val model = vocab.crossJoin(classes)
      .join(cntWL, Seq("word", "hyp"), "left")
      .join(broadcast(totL), "hyp")
      .crossJoin(broadcast(vSize))
      .select(col("word"), col("hyp"),
        qNegLn(coalesce(col("c"), lit(0L)) + 1L, col("t") + col("v_size"))
          .as("q"))
    val priors = docs.groupBy(col(labelCol).as("hyp"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("ndt"))))
      .select(col("hyp"), qNegLn(col("nd"), col("ndt")).as("qp"))
    val scored = toks
      .join(broadcast(model), "word")
      .groupBy(col(idCol), col("hyp"))
      .agg(min(col(labelCol)).as(labelCol), sum("q").as("s"))
      .join(broadcast(priors), "hyp")
      .withColumn("score", col("s") + col("qp"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").asc, col("hyp").asc)
    scored
      .withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(labelCol), col("hyp").as("pred_nb"),
        col("score").as("nb_score_micro"))
  }

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — Data
    * Selection via Importance Resampling): score every raw document by
    * how much more likely its features are under a TARGET domain than
    * under the raw corpus, log p_target(doc) − log p_raw(doc) under
    * smoothed unigram feature models. Positive weight = target-like;
    * resampling raw data ∝ exp(weight) shifts the mixture toward the
    * target domain.
    *
    * λ(w) = q_raw(w) − q_target(w), each side its own quantized negative
    * log over the SHARED vocab (exact features, no hash buckets: the
    * vocab table IS the bounded feature space here; a 100 TB run hashes
    * features to a fixed bucket count first, same plan). Document weight
    * = Σ λ(w_i), exact long math. Model tables are vocab-sized and
    * broadcast; one corpus read, no token-key shuffle. Returns
    * (idCol, n_tok, dsir_weight_micro). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column): DataFrame = {
    val toks = docs
      .select(col(idCol), isTarget.as("is_t"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
    val vocab = toks.select("word").distinct()
    val vSize = vocab.agg(count(lit(1)).as("v_size"))
    val cnts = toks.groupBy("word")
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_tgt"))
    val tots = toks.agg(count(lit(1)).as("t_raw"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("t_tgt"))
    val model = vocab
      .join(cnts, Seq("word"), "left")
      .crossJoin(broadcast(tots))
      .crossJoin(broadcast(vSize))
      .select(col("word"),
        (qNegLn(coalesce(col("c_raw"), lit(0L)) + 1L,
            col("t_raw") + col("v_size"))
          - qNegLn(coalesce(col("c_tgt"), lit(0L)) + 1L,
            col("t_tgt") + col("v_size"))).as("lambda"))
    toks
      .join(broadcast(model), "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        sum("lambda").as("dsir_weight_micro"))
  }
}
