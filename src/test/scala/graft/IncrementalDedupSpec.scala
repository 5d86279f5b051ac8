package graft

import graft.ops.Dedup
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Incremental LSH dedup: a new batch probed against a persisted
  * signature index finds its corpus near-dups, never re-pairs the corpus
  * with itself, and the index grows by append for the next batch.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest to hide from all the hunters"

  // corpus: two near-identical docs (1,2) + one unrelated (3)
  private def corpus = Seq(
    (1L, base),
    (2L, base + " tonight"),
    (3L, "completely different content about databases and distributed systems at scale")
  ).toDF("doc_id", "text")

  // new batch: a near-dup of corpus doc 1, and an unrelated doc
  private def batch = Seq(
    (100L, base + " quietly"),
    (101L, "unrelated fresh material mentioning streams watermarks and state stores only")
  ).toDF("doc_id", "text")

  test("new batch finds corpus near-dups; corpus pairs are never formed") {
    val idx = graft.io.TempDirs.createDeletedOnExit("lsh_idx_test_").getAbsolutePath
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    val pairs = Dedup.incrementalCandidatePairs(spark, batch, "doc_id", "text", idx)
      .as[(Long, Long)].collect().toSet
    // the planted near-dup is found against BOTH corpus copies
    assert(pairs.contains((100L, 1L)) && pairs.contains((100L, 2L)), s"got $pairs")
    // the unrelated new doc matches nothing
    assert(!pairs.exists(_._1 == 101L), s"got $pairs")
    // corpus-corpus pairs (1,2) are NOT recomputed — every pair's left
    // side is a new-batch doc
    assert(pairs.forall(_._1 >= 100L), s"got $pairs")
  }

  test("append grows the index: the next batch matches the previous one") {
    val idx = graft.io.TempDirs.createDeletedOnExit("lsh_idx_test2_").getAbsolutePath
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    // steady-state loop: probe batch 1, then append it to the index
    Dedup.writeSignatureIndex(batch, "doc_id", "text", idx, mode = SaveMode.Append)
    // batch 2 holds a near-dup of BATCH-1 doc 100 (not of the original corpus)
    val batch2 = Seq((200L, base + " quietly indeed")).toDF("doc_id", "text")
    val pairs = Dedup.incrementalCandidatePairs(spark, batch2, "doc_id", "text", idx)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((200L, 100L)), s"batch-2 must match appended batch-1: $pairs")
  }

  test("mismatched banding params are refused") {
    intercept[IllegalArgumentException](
      Dedup.incrementalCandidatePairs(spark, batch, "doc_id", "text", "/tmp/x",
        perms = 32, rowsPerBand = 7))
  }
}
