package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomBridge

/** Bloom-filter-gated cross-batch content-seen check — the "have we
  * ingested this before?" primitive of a continuously-fed training
  * corpus, at the same sub-document granularity as `q_dedup_paragraph`
  * (deterministic 16-token blocks; crawl boilerplate repeats at block
  * level long before whole documents collide).
  *
  * Why a Bloom filter and not the exact join directly: the exact
  * block-hash join needs ONE side small enough to broadcast. At 100 TB
  * neither side is — the corpus is the corpus, and a day's batch is
  * itself huge. The sketch fixes the asymmetry, fit-once/probe-many
  * like the MinHash signature index and the IVF layout:
  *
  *  1. **[[fitSketch]], once per corpus lifecycle**: one
  *     map-side-combined pass over the corpus blocks aggregates their
  *     hashes into a fixed-size filter (`numBits` bound, independent of
  *     corpus row count) — Spark's own `BloomFilterAggregate`. The
  *     serialized filter (numBits/8 bytes, 4 MiB default) is a
  *     driver-held corpus artifact like IVF centroids or PQ codebooks,
  *     amortized across every subsequent query batch.
  *  2. **Probe, map-side**: the sketch enters the batch scan as a
  *     binary literal; every batch block pays one codegen'd
  *     `might_contain` and the (overwhelming) never-seen majority exits
  *     BEFORE any shuffle or join. No false negatives — a seen block
  *     cannot slip through.
  *  3. **Exact verify**: the bloom-positive hashes (true-dup volume +
  *     the sized false-positive rate, NOT batch volume) are now the
  *     broadcastable side; ONE broadcast join against the corpus block
  *     stream — the only corpus scan a probe batch pays, map-side,
  *     never shuffled — confirms real membership and discards the
  *     false positives.
  *
  * Output is exact (the bloom is a transparent prefilter, so the DuckDB
  * oracle is the plain block join the sketch replaces at scale): one row
  * per batch document with at least one previously-seen block —
  * `(doc_id, n_blocks, n_seen_blocks, seen_ppm)` — hit-volume-sized,
  * never batch-sized.
  */
object BloomDedup {

  private def blocks(df: DataFrame, idCol: String, textCol: String,
                     window: Int): DataFrame =
    TextAnalysis.chunkDocs(df, idCol, textCol, window, window)
      .select(col(idCol), col("chunk_idx"),
        xxhash64(col("chunk_text")).as("h"))

  /** Build the corpus sketch — the expensive half, one corpus pass,
    * run per corpus LIFECYCLE (on append, re-fit or maintain a sketch
    * per partition and OR them — Bloom filters merge). `estItems`/
    * `numBits` size it: at the default 2²⁵ bits (4 MiB) and 2²² corpus
    * blocks the false-positive rate is ~0.2% — tune both up together
    * for a bigger corpus; [[seenBlocks]]' verify stage keeps the OUTPUT
    * exact at any rate, false positives only cost verify work.
    * Persist the returned bytes with [[graft.io.SketchStore.saveBloom]]
    * so a JVM restart probes the artifact instead of refitting. */
  def fitSketch(corpus: DataFrame, idCol: String, textCol: String,
                window: Int = 16, estItems: Long = 1L << 22,
                numBits: Long = 1L << 25): Array[Byte] =
    blocks(corpus, idCol, textCol, window)
      .agg(BloomBridge.bloom_filter_agg(col("h"), estItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Per-batch-document counts of blocks already present in `corpus`,
    * probing a [[fitSketch]] artifact distributed as a BROADCAST.
    * Per-invocation cost: one batch pass (persisted — the probe and the
    * totals read it) + ONE corpus pass (the exact-verify stream). The
    * sketch rides as a broadcast handle, NOT a plan literal — a 4 MiB
    * literal ships in every task's serialized plan and is re-hashed by
    * every plan compare, measured at 4.3× the query's pin before this
    * shape (BloomBridge.might_contain's scale warning). */
  def seenBlocks(corpus: DataFrame, batch: DataFrame,
                 idCol: String, textCol: String,
                 sketch: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                 window: Int = 16): DataFrame = {
    val batchBlocks = blocks(batch, idCol, textCol, window).persist()
    val positives = batchBlocks
      .filter(BloomBridge.might_contain_bcast(sketch, col("h")))
    // broadcast() bound: distinct bloom-positive hashes = true-dup volume
    // + the numBits-sized FP rate of the batch, 8 bytes each.
    val candHashes = positives.select("h").distinct()
    val verified = blocks(corpus, idCol, textCol, window)
      .join(broadcast(candHashes), "h")
      .select("h").distinct()
    // broadcast() bound: verified ⊆ candHashes (above).
    positives.join(broadcast(verified), "h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_seen_blocks"))
      .join(batchBlocks.groupBy(idCol).agg(count(lit(1)).as("n_blocks")),
        idCol)
      .select(col(idCol), col("n_blocks"), col("n_seen_blocks"),
        expr("n_seen_blocks * 1000000 div n_blocks").as("seen_ppm"))
  }

  /** Self-contained fit + probe that RETURNS the broadcast handle it
    * created, making per-call broadcast accumulation impossible to
    * overlook by construction: the previous DataFrame-only convenience
    * overload fit a sketch and wrapped it in a SparkContext broadcast it
    * could never unpersist (the frame is lazy), so a long-lived session
    * calling it in a loop leaked one `numBits/8`-byte broadcast block
    * per call — the documented foot-gun this signature retires. Callers
    * OWN the handle: probe (possibly many batches), then
    * `handle.unpersist()` when the corpus rotates. Production fits once
    * per corpus lifecycle ([[fitSketch]], or a persisted artifact via
    * `SketchStore.loadBloom`) and holds the handle the same way. */
  def fitAndProbe(corpus: DataFrame, batch: DataFrame,
                  idCol: String, textCol: String, window: Int,
                  estItems: Long, numBits: Long)
      : (DataFrame, org.apache.spark.broadcast.Broadcast[Array[Byte]]) = {
    val bytes = fitSketch(corpus, idCol, textCol, window, estItems, numBits)
    val handle = corpus.sparkSession.sparkContext.broadcast(bytes)
    (seenBlocks(corpus, batch, idCol, textCol, handle, window), handle)
  }
}
