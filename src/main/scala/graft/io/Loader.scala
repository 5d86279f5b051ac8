package graft.io

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Ingestion staging — the reference's uploader re-expressed (S6,
  * `upload_csv_to_s3.py:20-45`): pick the NEWEST dated CSV in a staging
  * folder and copy it into the pipeline's source directory. Selection uses
  * the same rule as the pipeline itself ([[Sources.latestByFilenameDate]]:
  * anchored `^(\d{8})` basename date, invalid dates skipped) so what the
  * loader stages is exactly what the next run picks up.
  *
  * Encryption-at-rest (the reference sets SSE-KMS ExtraArgs on every S3
  * put): on Hadoop filesystems that is connector configuration, not an API
  * call per write — for s3a the conf keys `fs.s3a.encryption.algorithm` /
  * `fs.s3a.encryption.key` make every write (this copy AND the parquet
  * sink) encrypt server-side with no code change. [[withSseKms]] wires
  * exactly those keys; on file:// they are inert, so tests exercise the
  * same code path the cluster runs.
  */
object Loader {

  /** Configure SSE-KMS for all subsequent s3a writes in this session. */
  def withSseKms(spark: SparkSession, kmsKeyArn: String): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.encryption.algorithm", "SSE-KMS")
    c.set("fs.s3a.encryption.key", kmsKeyArn)
  }

  /** Stage the newest dated CSV from `stagingDir` into `sourceDir`.
    * Returns the qualified destination path, or None when no valid dated
    * CSV exists (the reference logs and skips — Q2's no-crash contract). */
  def stageLatest(spark: SparkSession, stagingDir: String,
                  sourceDir: String): Option[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    Sources.latestByFilenameDate(Sources.listFiles(spark, stagingDir)).map { src =>
      val srcPath = new Path(src)
      val srcFs = srcPath.getFileSystem(conf)
      val dstDir = new Path(sourceDir)
      val dstFs = dstDir.getFileSystem(conf)
      dstFs.mkdirs(dstDir)
      val dst = new Path(dstDir, srcPath.getName)
      FileUtil.copy(srcFs, srcPath, dstFs, dst,
        /* deleteSource = */ false, /* overwrite = */ true, conf)
      dstFs.makeQualified(dst).toString
    }
  }
}
