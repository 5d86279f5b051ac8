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
  * itself huge. The Bloom filter fixes the asymmetry:
  *
  *  1. **Build, once per corpus lifecycle**: one map-side pass over the
  *     corpus blocks aggregates their hashes into a fixed-size sketch
  *     (`numBits` bound, independent of corpus row count) — Spark's own
  *     `BloomFilterAggregate`, partial-merged map-side like any agg. The
  *     sketch is a corpus artifact, amortized across query batches
  *     exactly like the MinHash signature index (`Dedup
  *     .writeSignatureIndex`) and the IVF layout.
  *  2. **Probe, map-side**: the one-row sketch broadcast-crosses the
  *     batch; every batch block pays one codegen'd `might_contain` and
  *     the (overwhelming) never-seen majority exits BEFORE any shuffle
  *     or join. No false negatives — a seen block cannot slip through.
  *  3. **Exact verify**: the bloom-positive hashes (true-dup volume +
  *     the sized false-positive rate, NOT batch volume) are now the
  *     broadcastable side; one broadcast join against the corpus block
  *     stream — corpus scanned map-side, never shuffled — confirms real
  *     membership and discards the false positives.
  *
  * Output is exact (the bloom is a transparent prefilter, so the DuckDB
  * oracle is the plain block join the sketch replaces at scale): one row
  * per batch document with at least one previously-seen block —
  * `(doc_id, n_blocks, n_seen_blocks, seen_ppm)` — hit-volume-sized,
  * never batch-sized.
  */
object BloomDedup {

  /** Per-batch-document counts of blocks already present in `corpus`.
    * `estItems`/`numBits` size the sketch: at the default 2²⁵ bits
    * (4 MiB broadcast) and 2²² corpus blocks the false-positive rate is
    * ~0.2% — tune both up together for a bigger corpus; the verify stage
    * keeps the OUTPUT exact at any rate, false positives only cost verify
    * work. */
  def seenBlocks(corpus: DataFrame, batch: DataFrame,
                 idCol: String, textCol: String, window: Int = 16,
                 estItems: Long = 1L << 22,
                 numBits: Long = 1L << 25): DataFrame = {
    def blocks(df: DataFrame) =
      TextAnalysis.chunkDocs(df, idCol, textCol, window, window)
        .select(col(idCol), col("chunk_idx"),
          xxhash64(col("chunk_text")).as("h"))
    val corpusBlocks = blocks(corpus)
    // (1) the sketch: one row, fixed size, map-side partials
    val bloom = corpusBlocks
      .agg(BloomBridge.bloom_filter_agg(col("h"), estItems, numBits).as("bf"))
    val batchBlocks = blocks(batch)
    // (2) map-side probe; negatives exit before any shuffle. The sketch
    // rides in as a scalar subquery (numBits/8 bytes, 4 MiB default —
    // corpus-size-independent), evaluated once; the probe is a codegen'd
    // filter predicate, no join at all.
    val positives = batchBlocks
      .filter(BloomBridge.might_contain(bloom, col("h")))
    // (3) exact verify: candidate hashes are bloom-positive-volume-sized
    // (true dups + sized FP rate), so THEY broadcast; the corpus block
    // stream is scanned map-side against them — never shuffled.
    // broadcast() bound: distinct bloom-positive hashes = true-dup volume
    // + numBits-sized FP rate of the batch, 8 bytes each.
    val candHashes = positives.select("h").distinct()
    val verified = corpusBlocks.join(broadcast(candHashes), "h")
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
}
