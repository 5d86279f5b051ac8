package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** SCD Type 2: apply a snapshot of entity updates onto a versioned
    * dimension, preserving full history.
    *
    * `dim` carries one row per (entity, validity interval): the tracked
    * attribute columns plus `[validFromCol, validToCol)` as epoch numbers;
    * an open (current) row has `validToCol == endOfTime` — the standard
    * 9999-12-31 sentinel rather than NULL, so the "current rows" predicate
    * is sargable and engines never disagree about null ordering/hashing.
    *
    * Per update row vs the entity's current row:
    *  - attributes differ → the current row CLOSES (`validTo = batchTs`)
    *    and a new open version is inserted (`validFrom = batchTs`);
    *  - attributes identical → no-op (idempotent re-loads don't grow
    *    history);
    *  - no current row → brand-new entity, inserted open.
    * Closed history rows always pass through untouched; updates must have
    * unique keys (same contract as [[upsert]]).
    *
    * Monotonic-batch contract: `batchTs` must be >= every current row's
    * `validFromCol` (batches applied in event-time order). Replaying an
    * OLDER batch against a newer current row would close it with
    * `validTo < validFrom` (an inverted interval) and insert a "current"
    * version that predates history — silently, since the arithmetic all
    * succeeds. This is documented rather than checked for the same reason
    * as upsert's unique-keys contract: verifying it needs an extra full
    * action (max(validFrom) over the current slice) per call; callers
    * doing out-of-order backfill should rebuild the dimension from the
    * ordered update log instead.
    *
    * Scale shape: ONE join, shuffled (or broadcast, for small snapshots)
    * on the key, over only the CURRENT slice of the dimension — history
    * never enters the join; it is a union passthrough that costs a scan.
    * Each joined row then fans out to its 1–2 output rows via a computed
    * array + explode, so the join is executed once (no self-union of three
    * filtered copies of the same join). At warehouse scale, partition the
    * dimension by an is-current flag or validTo date: the passthrough
    * becomes partition-pruned and the rewrite touches only the current
    * partition.
    */
  def scd2Apply(dim: DataFrame, updates: DataFrame, key: String,
                attrCols: Seq[String], validFromCol: String, validToCol: String,
                batchTs: Long, endOfTime: Long = 253402300799L): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    val history = dim.filter(col(validToCol) =!= endOfTime)
    val current = dim.filter(col(validToCol) === endOfTime)
      .select(col(key) +:
        attrCols.map(a => col(a).as(s"__c_$a")) :+
        col(validFromCol).as("__c_vf") :+ lit(true).as("__c"): _*)
    val snap = updates
      .select(col(key) +: attrCols.map(a => col(a).as(s"__u_$a")) :+ lit(true).as("__u"): _*)
    val j = current.join(snap, Seq(key), "full_outer")
    val isC = coalesce(col("__c"), lit(false))
    val isU = coalesce(col("__u"), lit(false))
    // null-safe per-attribute comparison: a null attribute equals null
    val differs = attrCols.map(a => !(col(s"__c_$a") <=> col(s"__u_$a"))).reduce(_ || _)
    def version(attrs: String => Column, vf: Column, vt: Column): Column =
      struct(attrCols.map(a => attrs(a).as(a)) :+ vf.as(validFromCol) :+ vt.as(validToCol): _*)
    val closedC = version(a => col(s"__c_$a"), col("__c_vf"), lit(batchTs))
    val keptC = version(a => col(s"__c_$a"), col("__c_vf"), lit(endOfTime))
    val freshU = version(a => col(s"__u_$a"), lit(batchTs), lit(endOfTime))
    val fanout =
      when(isC && isU && differs, array(closedC, freshU))
        .when(isC, array(keptC)) // matched-identical or no update: unchanged
        .otherwise(array(freshU)) // new entity
    val applied = j
      .select(col(key), explode(fanout).as("__v"))
      .select(col(key) +: (attrCols :+ validFromCol :+ validToCol)
        .map(c => col(s"__v.$c").as(c)): _*)
    history.select(applied.columns.map(col): _*).unionByName(applied)
  }
}
