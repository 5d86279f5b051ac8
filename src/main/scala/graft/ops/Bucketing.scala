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

  /** Collision-free table-name suffix for a source directory: sanitized
    * for identifier use PLUS a hash of the raw string, because
    * sanitization alone is not injective ("/data/sf0.1" and
    * "/data/sf0_1" would collide and silently serve one corpus's bucketed
    * copy for the other). */
  def tableSuffix(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))

  /** Idempotently materialize `df` as a managed bucketed table named
    * `table`, bucketed AND bucket-sorted by `key`. Reuses the table if this
    * session already built it — after verifying the existing table's bucket
    * spec matches (a name reused with a different key or bucket count would
    * silently return the wrong layout, or the wrong DATA); otherwise clears
    * any orphaned warehouse dir from a previous JVM (the in-memory catalog
    * forgets tables at exit, but the directory survives and would fail the
    * create) and writes.
    *
    * `repartition(buckets, key)` before the bucketed write aligns task
    * hashing with bucket hashing (both Murmur3 pmod), so each bucket is ONE
    * file — which keeps the per-bucket sort usable by downstream merges.
    */
  def ensureBucketed(spark: SparkSession, table: String, df: DataFrame,
                     buckets: Int, key: String): String = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    if (spark.catalog.tableExists(table)) {
      // DESCRIBE EXTENDED is the public surface that exposes the bucket
      // spec (the catalog API doesn't); refuse loudly on any mismatch
      val meta = spark.sql(s"DESCRIBE EXTENDED $table").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      require(meta.get("Num Buckets").contains(buckets.toString) &&
          meta.get("Bucket Columns").exists(_.contains(s"`$key`")),
        s"table $table exists with a different bucket spec " +
          s"(have: ${meta.get("Num Buckets")} buckets on ${meta.get("Bucket Columns")}; " +
          s"want: $buckets on `$key`) — refusing to silently reuse it")
    } else {
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
