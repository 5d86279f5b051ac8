package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table materialization — the co-located-join layout for the
  * 100 TB deployment.
  *
  * A fact table bucketed on its join key joins a same-bucketed table with
  * ZERO shuffle: both scans' output partitioning (`HashPartitioning(key,
  * buckets)`) already satisfies the sort-merge join's distribution
  * requirement, and a follow-up `groupBy` on the same key reuses it again.
  * At scale this turns the recurring fact-dimension join from the dominant
  * network cost into a per-bucket local merge — you pay the shuffle ONCE at
  * layout time, then every downstream join/aggregation on that key is
  * exchange-free. (`BucketedJoinSpec` + `PlanContractSpec` pin the plan
  * shape; `q_join_bucketed` exercises the path end-to-end in the catalog.)
  */
object Bucketing {

  /** Idempotently materialize `df` as a managed bucketed table named
    * `table`, bucketed AND bucket-sorted by `key`. Reuses the table if this
    * session already built it; otherwise clears any orphaned warehouse dir
    * from a previous JVM (the in-memory catalog forgets tables at exit, but
    * the directory survives and would fail the create) and writes.
    *
    * `repartition(buckets, key)` before the bucketed write aligns task
    * hashing with bucket hashing (both Murmur3 pmod), so each bucket is ONE
    * file — which keeps the per-bucket sort usable by downstream merges.
    */
  def ensureBucketed(spark: SparkSession, table: String, df: DataFrame,
                     buckets: Int, key: String): String = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    if (!spark.catalog.tableExists(table)) {
      val warehouse = new Path(spark.conf.get("spark.sql.warehouse.dir"),
        table.toLowerCase(java.util.Locale.ROOT))
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.delete(warehouse, true)
      df.repartition(buckets, col(key))
        .write.bucketBy(buckets, key).sortBy(key)
        .mode(SaveMode.Overwrite).saveAsTable(table)
    }
    table
  }
}
