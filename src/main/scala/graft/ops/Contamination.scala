package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TokenShingleHashes.token_shingle_hashes

/** Benchmark-contamination sweep: which training documents share at least
  * `minOverlap` distinct token `shingleN`-grams with an eval/benchmark
  * document?
  *
  * Shape (the anti-doc-pairs design): shingle-explode the corpus ONCE into
  * (doc_id, gram_hash) rows via the codegen'd
  * [[org.apache.spark.sql.graft.TokenShingleHashes]] kernel, build a tiny
  * *benchmark-shingle index* — per gram hash, the eval docs containing it —
  * and equi-join the training side against that index. Overlap counting is
  * a groupBy on (doc_id, eval_id); no document pair is ever enumerated
  * outside grams they actually share.
  *
  * 100 TB hardening (the two skew killers of the naive string self-join):
  *
  *  - '''Join keys are 8-byte hashes''', not ~40-byte gram strings, and the
  *    shingle frame is recomputed per consumer instead of persisted — the
  *    kernel is a narrow codegen'd map, so a second scan is cheaper than
  *    caching an exploded frame larger than the corpus (which is what the
  *    previous implementation's session-lifetime `persist()` did, and what
  *    made the round-3 bench artifact fragile).
  *  - '''Hot shingles are capped by document frequency''': a boilerplate
  *    gram appearing in >`maxShingleDf` documents fans out to
  *    |train docs| x |eval docs| join rows per gram — quadratic in exactly
  *    the grams that carry no contamination signal. The index drops them
  *    (standard practice in production contamination sweeps). Pick
  *    `maxShingleDf` above the corpus's max DF to disable the cap (exact
  *    semantics, used by the oracled catalog query); at real scale a few
  *    hundred is typical.
  *
  * The index is broadcast: its size is bounded by the EVAL corpus's
  * distinct grams (eval sets are benchmark suites — orders of magnitude
  * smaller than training corpora), so the training side — the 100 TB side —
  * joins map-side with ZERO shuffle; its only wide stage is the final
  * (doc_id, eval_id) overlap count, whose input is already
  * contamination-candidate rows.
  *
  * Index construction is deliberately two-phase so NO aggregation buffer
  * is ever unbounded: phase 1 computes per-gram counts only (constant-size
  * partial-agg buffers over the full corpus) and applies the DF cap;
  * phase 2 runs `collect_list` of eval ids only over eval-side grams that
  * SURVIVED the cap — a gram hot on the eval side (benchmark boilerplate)
  * is capped before any id list accumulates. Phase 2 re-derives the eval
  * gram stream from a fresh (eval-docs-only) scan, so it pays its own
  * exchange on `h` for the semi-join — an exchange of the BENCHMARK-sized
  * side, not the corpus; only phase 1's aggregate output arrives already
  * hash-partitioned on `h`.
  */
object Contamination {

  /** (doc_id, eval_id, overlap) for training docs sharing >= `minOverlap`
    * distinct token n-grams with an eval doc. `isEval` classifies a doc id;
    * null-text docs are dropped (they have no grams). */
  def sweep(docs: DataFrame, idCol: String, textCol: String,
            isEval: Column => Column, shingleN: Int = 5, minOverlap: Int = 3,
            maxShingleDf: Long = 1000L, broadcastIndex: Boolean = true): DataFrame = {
    require(shingleN > 0, s"shingleN must be positive: $shingleN")
    require(minOverlap > 0, s"minOverlap must be positive: $minOverlap")
    require(maxShingleDf > 0, s"maxShingleDf must be positive: $maxShingleDf")
    // narrow codegen'd explode — computed once per consumer, never cached
    val grams = docs.where(col(textCol).isNotNull).select(
      col(idCol).as("doc_id"),
      explode(token_shingle_hashes(col(textCol), shingleN)).as("h"))
    // phase 1 — per-gram counts only (count buffers are constant-size, so
    // this pass is safe on any corpus): corpus DF (grams are distinct
    // within a doc, so count(*) = document frequency) + eval presence,
    // with the hot-gram cap applied HERE, before any list accumulates
    val surviving = grams
      .groupBy("h")
      .agg(count(lit(1)).as("df"),
        count(when(isEval(col("doc_id")), lit(1))).as("n_eval"))
      .where(col("df") <= maxShingleDf && col("n_eval") > 0)
      .select(col("h"))
    // phase 2 — eval-id lists, only for surviving grams: the semi-join
    // runs over the (benchmark-sized) eval gram stream, and both it and
    // the groupBy reuse phase 1's partitioning on h
    val index = grams.where(isEval(col("doc_id")))
      .join(surviving, Seq("h"), "left_semi")
      .groupBy("h")
      .agg(collect_list(col("doc_id")).as("eval_ids"))
    // broadcast is a forced hint with no size check: the DF cap bounds each
    // gram's eval_ids list but NOT the number of surviving eval grams, so a
    // caller whose isEval marks a huge eval set can opt into a shuffle join
    // instead of risking a driver/executor OOM on the forced broadcast
    val indexSide = if (broadcastIndex) broadcast(index) else index
    grams.where(!isEval(col("doc_id")))
      .join(indexSide, "h")
      .select(col("doc_id"), explode(col("eval_ids")).as("eval_id"))
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("overlap"))
      .where(col("overlap") >= minOverlap)
  }
}
