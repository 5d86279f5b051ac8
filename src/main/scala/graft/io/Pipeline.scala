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

  /** Incremental variant — the Glue-bookmark contract (SURVEY §2.8 Q8):
    * process EVERY dated file not yet in the ledger, oldest first, each
    * into its own `ingest_date` partition; record files as processed only
    * after their write commits. A crashed run re-processes its in-flight
    * file into the same partition (overwrite), so the pipeline is
    * exactly-once at the partition level with at-least-once execution.
    *
    * @return (files processed this run, total rows written).
    */
  def runIncremental(spark: SparkSession, sourceDir: String, targetDir: String,
                     ledgerDir: String, strict: Boolean = false): (Seq[String], Long) = {
    val done = Ledger.processed(spark, ledgerDir)
    val pending = Sources.listFiles(spark, sourceDir)
      .flatMap(f => Sources.filenameDate(new org.apache.hadoop.fs.Path(f).getName).map(_ -> f))
      .filterNot { case (_, f) => done.contains(f) }
    // Group by date: files sharing a yyyyMMdd prefix land in the SAME
    // ingest_date partition, and the overwrite-by-partition sink would
    // otherwise let the last file erase its siblings' rows. One write per
    // date, covering every file of that date, keeps overwrite = idempotent.
    val byDate = pending.groupBy(_._1).toSeq.sortBy(_._1)
    var rows = 0L
    byDate.foreach { case (date, dateFiles) =>
      val files = dateFiles.map(_._2)
      val readings = files.map(Sources.readCsv(spark, _)).reduce(_ unionByName _)
      val expanded =
        (if (strict) IntervalExpand.strict(readings)
         else IntervalExpand.faithful(readings)).cache()
      rows += expanded.count()
      Sinks.writeIdempotent(expanded, targetDir, date.toString)
      Ledger.record(spark, ledgerDir, files)
      expanded.unpersist()
    }
    (byDate.flatMap(_._2.map(_._2)), rows)
  }
}
