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

  /** Per-table locks so two threads racing `ensureBucketed` on the same
    * name can't both observe tableExists==false, both delete the warehouse
    * dir, and race the saveAsTable. The harness is single-threaded but the
    * API is public; `computeIfAbsent` gives one canonical monitor per name. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Parse the backtick-quoted column list out of DESCRIBE EXTENDED's
    * 'Bucket Columns' value (rendered like ``[`k`, `id`]``) so the spec
    * check compares the FULL list for equality — a substring match would
    * accept a table bucketed on [`k`,`id`] as satisfying a single-column
    * spec on `k`, which has a different output partitioning and would NOT
    * remove the exchange.
    *
    * Backtick quoting is how current Spark renders the list, but it is
    * presentation, not contract: if a Spark version renders the columns
    * unquoted, the backtick regex would parse every valid table to an
    * empty list and `ensureBucketed` would loudly refuse ALL reuse (a
    * false refusal, not corruption — but still wrong). Fall back to
    * splitting the bracketed list on commas when no backticked tokens are
    * present. */
  private[graft] def parseBucketColumns(rendered: String): Seq[String] = {
    val quoted = "`([^`]+)`".r.findAllMatchIn(rendered).map(_.group(1)).toSeq
    if (quoted.nonEmpty) quoted
    else rendered.stripPrefix("[").stripSuffix("]").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
  }

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
    *
    * Reuse contract: a matching-spec table is served as-is — same-name
    * reuse within one JVM assumes the SAME source data (callers derive
    * `table` from the source directory via [[tableSuffix]], which makes the
    * name a content key; pass a different name for different data).
    */
  def ensureBucketed(spark: SparkSession, table: String, df: DataFrame,
                     buckets: Int, key: String): String = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    tableLocks.computeIfAbsent(table, _ => new Object).synchronized {
      if (spark.catalog.tableExists(table)) {
        // DESCRIBE EXTENDED is the public surface that exposes the bucket
        // spec (the catalog API doesn't); refuse loudly on any mismatch.
        // Compare the parsed column LIST for exact equality, not substring
        // containment — [`k`,`id`] must not pass as a spec on [`k`].
        val meta = spark.sql(s"DESCRIBE EXTENDED $table").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        require(meta.get("Num Buckets").contains(buckets.toString) &&
            meta.get("Bucket Columns").map(parseBucketColumns)
              .contains(Seq(key)),
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
    }
    table
  }
}
