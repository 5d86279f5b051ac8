package graft

import graft.ops.Dedup
import graft.queries.tbl
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe for SCALE.md: the 100×-regime stress shape of the
  * CONTINUOUS ingest-dedup loop (`q_stream_dedup_ingest` is the 4-batch
  * catalog version) — what happens to the signature index and the
  * per-batch cost when the loop runs for ~20 staged batches, the way
  * production would run it daily forever.
  * Usage: `Test/runMain graft.StreamIngestGrowthProbe [sfDir] [nBatches]`
  *
  * Per batch, the steady-state loop from Dedup.writeSignatureIndex's
  * contract: (1) probe batch-vs-index candidates, (2) intra-batch
  * self-dedup, (3) append the batch's buckets to the index. The probe
  * measures, per round: probe wall, append wall, index rows/bytes, and
  * candidate volume — the curve that answers "does batch N cost what
  * batch 1 cost?" (shuffle volume stays batch-sized by construction —
  * IncrementalDedupProbe pins that; THIS probe watches the index-side
  * costs that probe holds fixed).
  */
object StreamIngestGrowthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("stream-ingest-growth-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = tbl(spark, sfDir, "documents").persist()
    val isNew = col("doc_id") % 5 === 0
    val base = d.where(!isNew)
    val idx = graft.io.TempDirs.createDeletedOnExit("growth_lshidx_")
      .getAbsolutePath
    Dedup.writeSignatureIndex(base, "doc_id", "text", idx)

    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def indexBytes(): Long =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(idx)).getLength
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println(f"[growth-probe] corpus=${d.count()} docs, base index " +
      f"rows=${spark.read.parquet(idx).count()}, " +
      f"${indexBytes() / 1024.0 / 1024.0}%.2f MiB, $nBatches staged batches")
    println("[growth-probe] batch | docs | probe_s | cands | intra_s | " +
      "append_s | idx_rows | idx_MiB")
    for (i <- 0 until nBatches) {
      val batch = d.where(isNew && (col("doc_id") / 5) % nBatches === i)
        .persist()
      val nDocs = batch.count()
      val (nCands, probeS) = timed(
        Dedup.incrementalCandidatePairs(spark, batch, "doc_id", "text", idx)
          .count())
      val (_, intraS) = timed(
        Dedup.lshCandidatePairs(
          Dedup.minHashSignatures(batch, "doc_id", "text")).count())
      val (_, appendS) = timed(
        Dedup.writeSignatureIndex(batch, "doc_id", "text", idx,
          mode = SaveMode.Append))
      val (rows, _) = timed(spark.read.parquet(idx).count())
      println(f"[growth-probe] $i%5d | $nDocs%4d | $probeS%7.2f | " +
        f"$nCands%5d | $intraS%7.2f | $appendS%8.2f | $rows%8d | " +
        f"${indexBytes() / 1024.0 / 1024.0}%7.2f")
      batch.unpersist()
    }
    spark.stop()
  }
}
