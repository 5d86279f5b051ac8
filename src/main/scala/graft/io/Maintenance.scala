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

  /** Compact a LEAF parquet directory to ~`targetFileBytes` files: read,
    * compute the file count from the actual data size, rewrite via a temp
    * directory and a two-rename swap. Returns (files before, files after).
    *
    * Refuses partitioned roots (no top-level data files): compacting one
    * would flatten the `col=value/` layout and destroy partition pruning —
    * at cluster scale compaction runs per leaf partition (only those whose
    * small-file count crosses a threshold), keeping the rewrite incremental.
    *
    * The swap is rename(live -> backup); rename(tmp -> live); delete backup
    * — each rename is atomic on HDFS-like filesystems, so no window leaves
    * the path nonexistent alongside a successful reader-visible state; a
    * crash between the renames is recoverable from the `_precompact` backup
    * (unlike delete-then-rename, which can lose the only copy's listing).
    * Object stores without atomic rename should use a table format instead.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles
    require(before.nonEmpty,
      s"$dir has no top-level parquet files — partitioned root or empty; " +
        "compact each leaf partition directory instead")
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(dir + "_compacting")
    val backup = new Path(dir + "_precompact")
    fs.delete(tmp, true); fs.delete(backup, true)
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(path, backup), s"rename $path -> $backup failed")
    require(fs.rename(tmp, path), s"rename $tmp -> $path failed; original at $backup")
    fs.delete(backup, true)
    (before.size, dataFiles.size)
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
