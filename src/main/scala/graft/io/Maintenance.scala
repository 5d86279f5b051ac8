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

  /** Compact a parquet directory to ~`targetFileBytes` files: read, compute
    * the file count from the actual data size, rewrite atomically via a
    * temp directory + rename. Returns (files before, files after).
    *
    * At cluster scale this runs per-partition (compact only partitions whose
    * small-file count crosses a threshold) so the rewrite is incremental.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(dir + "_compacting")
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(path, true)
    fs.rename(tmp, path)
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
