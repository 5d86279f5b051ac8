package graft

import graft.ops.BloomDedup
import org.apache.spark.sql.functions._

/** Contract for the Bloom-gated content-seen check (`q_dedup_bloom`):
  * exactness (the sketch is a transparent prefilter — output equals the
  * plain exact block join), planted-dup recall, never-seen silence, and
  * the plan properties that make it the 100 TB shape (a `might_contain`
  * probe gates the batch; the corpus block stream is never a shuffle-join
  * build side). */
class BloomDedupSpec extends SparkSpec {

  import spark.implicits._

  private def tok(n: Int, tag: String) =
    (0 until n).map(i => s"${tag}_w$i").mkString(" ")

  test("planted cross-batch block dup is found with exact counts; unique doc is silent") {
    // corpus doc 1 = blocks A|B; batch doc 10 = A|C (one seen block of
    // two), batch doc 15 = D|E (never seen) -> absent from output
    val a = tok(16, "a"); val b = tok(16, "b")
    val cdoc = s"$a $b"
    val docs = Seq(
      (1L, cdoc), (2L, tok(16, "z")),
      (10L, s"$a ${tok(16, "c")}"), (15L, s"${tok(16, "d")} ${tok(16, "e")}"))
      .toDF("doc_id", "text")
    val (df, handle) = BloomDedup.fitAndProbe(
        docs.filter($"doc_id" % 5 =!= 0), docs.filter($"doc_id" % 5 === 0),
        "doc_id", "text", window = 16, estItems = 1L << 22, numBits = 1L << 25)
    val out = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    handle.unpersist()
    assert(out.toSeq == Seq((10L, 2L, 1L, 500000L)), out.mkString(", "))
  }

  test("bloom output equals the exact block join on the real corpus (FP transparency)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = d.filter($"doc_id" % 5 =!= 0)
    val batch = d.filter($"doc_id" % 5 === 0)
    // tiny sketch on purpose: 2^12 bits over ~3k corpus blocks forces a
    // REAL false-positive rate through the probe stage, so this test
    // fails if the verify stage ever stops discarding them
    val (bloomDf, handle) = BloomDedup.fitAndProbe(corpus, batch,
      "doc_id", "text", window = 16, estItems = 1L << 12, numBits = 1L << 12)
    val viaBloom = bloomDf.orderBy("doc_id").collect().toSeq
    handle.unpersist()
    def blocks(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.chunkDocs(df, "doc_id", "text", 16, 16)
        .select(col("doc_id"), col("chunk_text"))
    val exact = blocks(batch).as("b")
      .join(blocks(corpus).select($"chunk_text").distinct().as("c"), "chunk_text")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_seen_blocks"))
      .join(blocks(batch).groupBy("doc_id").agg(count(lit(1)).as("n_blocks")), "doc_id")
      .select($"doc_id", $"n_blocks", $"n_seen_blocks",
        expr("n_seen_blocks * 1000000 div n_blocks").as("seen_ppm"))
      .orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty, "fixture degenerate: no cross-batch shared blocks")
    assert(viaBloom == exact)
  }

  test("plan: might_contain gates the batch; corpus blocks never shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sketch = spark.sparkContext.broadcast(BloomDedup.fitSketch(
      d.filter($"doc_id" % 5 =!= 0), "doc_id", "text"))
    val out = BloomDedup.seenBlocks(
      d.filter($"doc_id" % 5 =!= 0), d.filter($"doc_id" % 5 === 0),
      "doc_id", "text", sketch)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom probe missing from the executed plan")
    // every join is a broadcast join: the corpus block stream must only
    // ever be the streamed side of a broadcast, never shuffled for a join
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus blocks reached a shuffle join:\n$plan")
  }
}
