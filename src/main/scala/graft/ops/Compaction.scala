package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction: rewrite a parquet directory into files of
  * ~`targetFileBytes` each.
  *
  * Why it exists at 100 TB: streaming ingests, per-batch foreachBatch
  * sinks, and fine-grained dynamic-partition overwrites all accrete
  * thousands of KB-scale files per day. Every downstream scan then pays
  * one task + one footer read + one open/seek per file: a 1 M-file table
  * turns a column-pruned scan that should take seconds into hours of
  * scheduler and namenode/liststore churn. Periodic compaction is the
  * maintenance primitive every table format (OPTIMIZE / rewrite_data_files)
  * ships; this is the plain-Spark expression of it.
  *
  * Scale shape:
  *  - sizing comes from the file-system LISTING (driver-side metadata,
  *    like every planner's split enumeration) — the data itself is never
  *    counted or collected to plan the rewrite.
  *  - the rewrite uses `coalesce`, which is NARROW: input files are
  *    concatenated into output tasks with no shuffle, so compacting N
  *    bytes costs exactly one read + one write of those bytes. A
  *    `repartition` would add a full shuffle only to balance file sizes —
  *    wasted at 100 TB when input files are uniformly small (the common
  *    case) and AQE already split genuinely skewed inputs upstream. For
  *    clustered layouts, compact and THEN `ZOrder.writeZOrdered` (which
  *    pays its one range shuffle deliberately).
  *  - the swap is write-validate-rename: output lands in a sibling temp
  *    dir, the rewrite is validated by row count, and only then do two
  *    atomic directory renames swap it in. The window between the renames
  *    is the documented non-transactional residue — closing it is exactly
  *    what table-format commit protocols (snapshot pointer swap) exist
  *    for; on a production lakehouse this operator runs inside one.
  */
object Compaction {

  /** Parquet layout of a directory as the planner sees it: data-file count
    * and total bytes from one driver-side listing (no data read). */
  final case class LayoutStats(nFiles: Long, totalBytes: Long) {
    def avgFileBytes: Long = if (nFiles == 0) 0L else totalBytes / nFiles
  }

  def layoutStats(spark: SparkSession, dir: String): LayoutStats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) LayoutStats(0, 0)
    else {
      val files = fs.listStatus(path).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      LayoutStats(files.size.toLong, files.map(_.getLen).sum)
    }
  }

  /** Output file count for a rewrite: ceil(total / target), floor 1. */
  def planFileCount(totalBytes: Long, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
  }

  /** Compact `dir` in place to ~`targetFileBytes` files; returns the new
    * layout. No-op (zero IO beyond the listing) when the layout already
    * meets the target — re-running a maintenance job must not rewrite a
    * healthy table. */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): LayoutStats = {
    val before = layoutStats(spark, dir)
    val n = planFileCount(before.totalBytes, targetFileBytes)
    // already compact: fewer (or equal) files than the plan asks for
    if (before.nFiles <= n) return before

    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compact_tmp")
    val trash = new Path(dir + "__compact_old")
    fs.delete(tmp, true); fs.delete(trash, true)

    val src = spark.read.parquet(dir)
    val expected = src.count()
    // narrow rewrite: no shuffle — see the scaladoc for why not repartition
    src.coalesce(n).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val actual = spark.read.parquet(tmp.toString).count()
    if (actual != expected) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction rewrite of $dir lost rows: expected $expected, wrote $actual")
    }
    // two atomic renames; the instant between them is the documented
    // non-transactional window (a table-format pointer swap closes it)
    if (!fs.rename(path, trash))
      throw new IllegalStateException(s"compaction could not stage-out $dir")
    if (!fs.rename(tmp, path)) {
      fs.rename(trash, path) // roll back: restore the original layout
      throw new IllegalStateException(s"compaction could not swap in $tmp")
    }
    fs.delete(trash, true)
    layoutStats(spark, dir)
  }
}
