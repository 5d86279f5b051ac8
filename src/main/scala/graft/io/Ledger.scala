package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Processed-files ledger — the engine's analogue of Glue job bookmarks
  * (`--job-bookmark-option: job-bookmark-enable`,
  * `/root/reference/batch_processing_IaC.py:301`): incremental runs skip
  * inputs recorded as already processed.
  *
  * Layout: a directory of immutable marker files, one per completed run,
  * each listing the input paths that run processed (newline-separated).
  * Append-only + one-file-per-run means concurrent readers never see a
  * partial record and re-running a failed job re-processes its inputs
  * (markers are written only after the sink commit, mirroring the
  * bookmark-after-success contract). Driver-side metadata only — the
  * ledger stays tiny regardless of data volume.
  */
object Ledger {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All input paths recorded as processed. Empty if the ledger is new. */
  def processed(spark: SparkSession, ledgerDir: String): Set[String] = {
    val f = fs(spark, ledgerDir)
    val p = new Path(ledgerDir)
    if (!f.exists(p)) Set.empty
    else f.listStatus(p).toSeq.filter(_.isFile).flatMap { st =>
      val in = f.open(st.getPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }.filter(_.nonEmpty).toSet
  }

  /** Record `files` as processed — call only AFTER the sink commit. */
  def record(spark: SparkSession, ledgerDir: String, files: Seq[String]): Unit = {
    if (files.isEmpty) return
    val f = fs(spark, ledgerDir)
    f.mkdirs(new Path(ledgerDir))
    val marker = new Path(ledgerDir, s"run-${System.currentTimeMillis()}-${files.hashCode().toHexString}.txt")
    val out = f.create(marker, false)
    try out.write((files.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
