package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE / upsert: apply a keyed delta onto a base table in one
  * pass — the engine-side half of the classic incremental-load contract
  * (MERGE INTO in SQL warehouses; the reference's monthly batch rewrites
  * its whole output instead, `pyspark_skript/pyspark_script.py:110-113`,
  * which this generalizes).
  *
  * Semantics: rows present in both take the delta's values (update);
  * delta-only rows are inserted; base-only rows pass through. Delta nulls
  * overwrite base values only when the whole row is an update — a matched
  * delta row IS the new row (standard MERGE "WHEN MATCHED THEN UPDATE SET
  * *" semantics), not a per-column patch.
  *
  * Scale shape: one full-outer join shuffled on the key. A delta below the
  * broadcast threshold turns it into a broadcast join automatically; a
  * bucketed base makes it narrow on the base side. Pair with
  * `Sinks.overwritePartitions` to write back only the partitions the
  * delta touched (idempotent re-runs).
  */
object Merge {

  /** Upsert `delta` onto `base`. The row-presence flag distinguishes a
    * genuine delta row from a matched row whose columns happen to be null.
    *
    * Preconditions: `delta` must cover every base column (checked — a
    * missing value column would otherwise resolve against the base side
    * and silently undo the update), and delta keys MUST be unique — SQL
    * MERGE raises on multiple matches per target row; this operator is a
    * join, so a duplicated delta key would instead emit one output row per
    * duplicate. Deduplicate first (e.g. keep the latest by version) —
    * checking here would cost an extra full action per call.
    */
  def upsert(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    // honor the session's resolver: Spark matches columns case-
    // insensitively unless spark.sql.caseSensitive is set, and this guard
    // must not reject a delta the join below would resolve fine
    val caseSensitive =
      base.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    // Locale.ROOT: Spark's resolver is locale-independent (equalsIgnoreCase),
    // so canonicalization must be too — default-locale toLowerCase would
    // mangle e.g. "ID" under a Turkish JVM locale and falsely reject it
    def canon(c: String): String =
      if (caseSensitive) c else c.toLowerCase(java.util.Locale.ROOT)
    val deltaCols = delta.columns.map(canon).toSet
    val missing = base.columns.filterNot(c => deltaCols.contains(canon(c)))
    require(missing.isEmpty,
      s"delta is missing base columns: ${missing.mkString(", ")} — " +
        "MERGE semantics need the full row on the delta side")
    val valueCols = base.columns.filterNot(keys.contains).toSeq
    val d = delta.withColumn("__is_delta", lit(true))
    base.as("b").join(d.as("d"), keys, "full_outer")
      .select(keys.map(col) ++ valueCols.map(c =>
        when(col("d.__is_delta"), col(s"d.$c")).otherwise(col(s"b.$c")).as(c)): _*)
  }
}
