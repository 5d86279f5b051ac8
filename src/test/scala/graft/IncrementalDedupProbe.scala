package graft

import graft.ops.Dedup
import graft.queries.tbl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for SCALING.md §7: shuffle volume of full-corpus LSH
  * candidate generation vs an incremental index probe for the same batch.
  * Usage: `Test/runMain graft.IncrementalDedupProbe [sfDir]`
  *
  * The full pipeline's banded self-join must shuffle the whole corpus's
  * bucket stream every run; the incremental probe broadcasts only the
  * batch's buckets against the persisted index (map-side), so its
  * exchanged bytes stay proportional to the BATCH — the number that keeps
  * per-batch dedup cost flat as the corpus grows.
  */
object IncrementalDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("incremental-dedup-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // disable auto-broadcast so the FULL pipeline shows its true shuffle
    // shape (at real scale neither self-join side fits a broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val d = tbl(spark, sfDir, "documents")
    val isNew = col("doc_id") % 5 === 0
    val nDocs = d.count(); val nBatch = d.where(isNew).count()

    // full pipeline: corpus-wide banded self-join, paid EVERY run
    val (nFull, bytesFull) = PlanMetrics.shuffled(
      Dedup.lshCandidatePairs(Dedup.minHashSignatures(d, "doc_id", "text")))

    // incremental: index built once (layout cost, not per-batch), then the
    // batch probes it; the probe's broadcast is explicit so it survives
    // the disabled auto-broadcast above
    val idx = graft.io.TempDirs.createDeletedOnExit("probe_lshidx_").getAbsolutePath
    Dedup.writeSignatureIndex(d.where(!isNew), "doc_id", "text", idx)
    val (nInc, bytesInc) = PlanMetrics.shuffled(
      Dedup.incrementalCandidatePairs(spark, d.where(isNew), "doc_id", "text", idx))

    println(f"[incr-probe] corpus=$nDocs docs, batch=$nBatch docs")
    println(f"[incr-probe] full self-join:    $nFull exchanges, ${bytesFull / 1024.0 / 1024.0}%.2f MiB exchanged per run")
    println(f"[incr-probe] incremental probe: $nInc exchanges, ${bytesInc / 1024.0 / 1024.0}%.2f MiB exchanged per run")
    spark.stop()
  }
}
