package graft.io

import graft.ops.IntervalExpand
import org.apache.spark.sql.SparkSession

/** The reference's end-to-end batch job (entry point A, SURVEY §3.1),
  * re-expressed: discover the newest dated CSV -> densify intervals ->
  * write parquet. The orchestration contract (monthly trigger, .sync
  * retry semantics, bookmarks) reduces to: run() either completes or
  * throws — exit codes replace Step Functions states.
  */
object Pipeline {

  /** @param strict  false = reference-faithful expansion (string
    *                timestamps, Q3/Q4 quirks); true = typed + sane.
    * @param idempotent  true = overwrite-by-ingest-date partition (Q8
    *                fixed); false = reference-faithful append.
    * @return number of output rows written.
    */
  def run(spark: SparkSession, sourceDir: String, targetDir: String,
          strict: Boolean = false, idempotent: Boolean = true): Long = {
    val files = Sources.listFiles(spark, sourceDir)
    val latest = Sources.latestByFilenameDate(files).getOrElse {
      // Q1/Q2 decision: fail fast, no silent fallback to a hardcoded file.
      throw new IllegalStateException(
        s"no dated CSV (yyyyMMdd_*.csv) found under $sourceDir")
    }
    val readings = Sources.readCsv(spark, latest)
    val expanded =
      if (strict) IntervalExpand.strict(readings)
      else IntervalExpand.faithful(readings)
    val out = expanded.cache()
    val n = out.count()
    val ingestDate = Sources.filenameDate(
      new org.apache.hadoop.fs.Path(latest).getName).get.toString
    if (idempotent) Sinks.writeIdempotent(out, targetDir, ingestDate)
    else Sinks.writeAppend(out, targetDir)
    out.unpersist()
    n
  }
}
