package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TokenShinglePosHashes.token_shingle_pos_hashes

/** Exact-substring deduplication (the Lee-et-al-style "shared 50-token
  * run" pass): for every pair of distinct documents, the length of the
  * LONGEST run of consecutive tokens they share exactly, reported when it
  * reaches `minRun` tokens. MinHash/SimHash find near-duplicate
  * *documents*; this finds long verbatim *substrings* — licenses,
  * boilerplate, quoted passages — across otherwise-distinct documents,
  * the one dedup modality document-level sketches cannot express.
  *
  * Algorithm (bucketed anchors, never all-pairs, no string comparison
  * after tokenization):
  *
  *  1. '''Anchor grams''': every `minRun`-token window of every document,
  *     hashed positionally by the codegen'd
  *     [[org.apache.spark.sql.graft.TokenShinglePosHashes]] kernel
  *     (8-byte keys; a doc shorter than `minRun` tokens emits nothing).
  *     Any shared run of R >= minRun tokens contains R - minRun + 1
  *     shared anchors — one anchor is both necessary and sufficient for
  *     detection, so recall is exact by construction.
  *  2. '''Candidate join''' on the anchor hash with `doc_a < doc_b`:
  *     document pairs meet ONLY at grams they actually share — the join
  *     fan-out is sum over grams of (docs containing the gram choose 2),
  *     not |docs|².
  *  3. '''Exact extend, relationally''': a shared run lies on one
  *     alignment diagonal (pos_a - pos_b constant), where its anchors
  *     occupy CONSECUTIVE pos_a values. Grouping by (pair, diagonal) and
  *     island-detecting pos_a (pos_a - row_number, the classic
  *     gaps-and-islands identity) turns each maximal run into one group;
  *     its token length is anchors + minRun - 1. No re-reading of text,
  *     no per-pair UDF loop.
  *
  * Correctness note: anchor equality is 64-bit hash equality, so two
  * UNEQUAL grams merge with p ~ 2^-64 — over a corpus with G total grams
  * the chance of ANY spurious/extended run is ~ G²/2^65 (the same
  * argument, and the same hash, as [[Contamination]]); the DuckDB oracle
  * compares gram *strings* and hash-matches at every tested SF.
  *
  * 100 TB shape: the gram stream is a narrow codegen'd map over the
  * corpus — ~1 row per token, never cached (recompute beats materializing
  * a frame larger than the corpus). Its one wide stage is the self-join's
  * hash-partition on the 8-byte anchor key. The quadratic hazard is the
  * same one [[Contamination]] documents — a boilerplate gram present in
  * thousands of documents fans out quadratically while carrying no new
  * pair information (any TRUE long run still anchors at its less-common
  * grams) — so `maxGramDf` drops grams above a document-frequency cap,
  * computed in a constant-buffer count pass first. The catalog entry runs
  * with the cap above the corpus max (exact semantics, oracle-matched);
  * a production 100 TB sweep sets a few hundred. Window/groupBy stages
  * after the join operate per (pair, diagonal) — cardinality bounded by
  * matched anchors, already candidate-scale, and AQE splits any skewed
  * hash bucket.
  */
object SubstringDedup {

  /** (doc_a, doc_b, max_run_tokens, n_runs) for pairs sharing at least one
    * exact `minRun`-token run. `maxGramDf` caps anchor document frequency
    * (set above corpus max DF to disable — exact). Null-text docs have no
    * grams and never pair. */
  def longestSharedRuns(docs: DataFrame, idCol: String, textCol: String,
                        minRun: Int, maxGramDf: Long = 1000L): DataFrame = {
    require(minRun > 0, s"minRun must be positive: $minRun")
    require(maxGramDf > 0, s"maxGramDf must be positive: $maxGramDf")
    val grams = docs.where(col(textCol).isNotNull).select(
      col(idCol).as("doc_id"),
      posexplode(token_shingle_pos_hashes(col(textCol), minRun))
        .as(Seq("pos", "h")))
    // DF-cap pass: count buffers only (constant size per gram), applied
    // BEFORE the self-join so a hot gram never fans out. count(*) over the
    // positional stream counts occurrences, not documents — a gram
    // repeated inside one doc (itself a self-repetition signal) moves
    // toward the cap, which is the conservative direction for a cap whose
    // job is bounding join fan-out.
    val surviving = grams.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxGramDf).select(col("h"))
    val g = grams.join(surviving, Seq("h"), "left_semi")
    val matches = g.alias("a").join(g.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pos_a"),
        (col("a.pos") - col("b.pos")).as("diag"))
    // gaps-and-islands on each alignment diagonal: consecutive pos_a
    // values share (pos_a - row_number), one group per maximal run
    val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    matches
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "island")
      .agg((count(lit(1)) + (minRun - 1)).as("run_tokens"))
      .groupBy("doc_a", "doc_b")
      .agg(max("run_tokens").as("max_run_tokens"),
        count(lit(1)).as("n_runs"))
  }
}
