package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-maintenance operators for the 100 TB layout (SCALING.md §13).
  *
  * Small files are the silent killer of large parquet tables: a monthly
  * incremental pipeline writing a handful of files per run accumulates
  * thousands of sub-optimal files per partition — every reader then pays
  * per-file open/footer costs and loses row-group-level pruning.
  */
object Maintenance {

  /** Parquet layout of a leaf directory as the planner sees it: data-file
    * count and total bytes from one driver-side listing (no data read). */
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

  /** Compact a LEAF parquet directory to ~`targetFileBytes` files, sized
    * from the file-system LISTING (driver-side metadata — the data is
    * never scanned to plan the rewrite); returns the resulting layout.
    *
    * No-op (zero IO beyond the listing) when the layout already meets the
    * target: a scheduled maintenance job must never rewrite a healthy
    * table. Refuses partitioned roots (no top-level data files):
    * compacting one would flatten the `col=value/` layout and destroy
    * partition pruning — at cluster scale compaction runs per leaf
    * partition, only where the small-file count crosses a threshold,
    * keeping the rewrite incremental.
    *
    * The rewrite is `coalesce` — NARROW, no shuffle: compacting N bytes
    * costs exactly one read + one write of those bytes. A `repartition`
    * would add a full shuffle only to balance output sizes, wasted when
    * the inputs are uniformly small (the accretion case this fixes). The
    * rewrite is validated by row count before it replaces anything.
    *
    * Read-width tradeoff: `coalesce(n)` fuses the scan into n tasks, so
    * compacting thousands of small files into, say, 4 targets reads
    * 4-wide. (Chaining two coalesces does NOT widen the read — narrow
    * coalesces fuse into one stage, and the smaller n wins.) For the
    * common accretion case — tens to hundreds of small files per leaf —
    * n-wide reading of small inputs is still IO-bound-fine and the saved
    * shuffle dominates. For a very high file-count leaf (thousands of
    * files into a handful of targets) pass `shuffle = true`: the rewrite
    * becomes `repartition(n)` — the scan runs at full parallelism (one
    * task per input split) and the one extra shuffle of the leaf's bytes
    * buys an N-times-wider read.
    *
    * The swap is rename(live -> backup); rename(tmp -> live); delete
    * backup — each rename is atomic on HDFS-like filesystems, a failed
    * second rename rolls the backup straight back, and a crash between
    * the renames is recoverable from the `_precompact` backup (unlike
    * delete-then-rename, which can lose the only copy's listing). Object
    * stores without atomic rename should run this inside a table format's
    * commit protocol instead.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              shuffle: Boolean = false): LayoutStats = {
    val before = layoutStats(spark, dir)
    require(before.nFiles > 0,
      s"$dir has no top-level parquet files — partitioned root or empty; " +
        "compact each leaf partition directory instead")
    val n = planFileCount(before.totalBytes, targetFileBytes)
    if (before.nFiles <= n) return before // already compact

    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "_compacting")
    val backup = new Path(dir + "_precompact")
    fs.delete(tmp, true); fs.delete(backup, true)

    val src = spark.read.parquet(dir)
    val expected = src.count()
    val rewritten = if (shuffle) src.repartition(n) else src.coalesce(n)
    rewritten.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val actual = spark.read.parquet(tmp.toString).count()
    if (actual != expected) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction rewrite of $dir lost rows: expected $expected, wrote $actual")
    }
    require(fs.rename(path, backup), s"rename $path -> $backup failed")
    if (!fs.rename(tmp, path)) {
      // Roll back: restore the original layout. The rollback rename's own
      // result must be checked — if it ALSO fails, the table is stranded
      // at `_precompact` with no live path, and the exception must say so
      // rather than falsely claim restoration.
      val restored = fs.rename(backup, path)
      fs.delete(tmp, true)
      if (restored)
        throw new IllegalStateException(
          s"rename $tmp -> $path failed; original restored from $backup")
      else
        throw new IllegalStateException(
          s"rename $tmp -> $path failed AND rollback rename $backup -> $path " +
            s"failed: table data is intact but parked at $backup — manually " +
            s"rename it back to $path")
    }
    fs.delete(backup, true)
    layoutStats(spark, dir)
  }

  /** Sorted-clustered write: partition by the pruning key, sort WITHIN each
    * partition by the clustering keys — readers get partition pruning from
    * the directory layout plus row-group min/max skipping from the sort,
    * and sorted columns compress better. No global sort (no range shuffle):
    * sortWithinPartitions is a per-task sort after the partitionBy shuffle.
    *
    * The partition column leads the task sort: FileFormatWriter requires
    * task rows ordered by the partition columns and inserts its own
    * (unstable) sort if they aren't — which would destroy the clustering
    * order. With the partition column as a sort prefix the writer reuses
    * our ordering as-is.
    */
  def writeClustered(df: DataFrame, dir: String, partitionCol: String,
                     sortCols: Seq[String]): Unit =
    df.repartition(org.apache.spark.sql.functions.col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(org.apache.spark.sql.functions.col): _*)
      .write.partitionBy(partitionCol).mode(SaveMode.Overwrite).parquet(dir)
}
