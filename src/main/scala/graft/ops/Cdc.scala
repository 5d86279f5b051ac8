package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture by snapshot diff: derive the insert/update/delete
  * changelog between two versions of a keyed table — the inverse of
  * [[Merge.upsert]] (MERGE applies a changelog; this recovers one), and
  * the standard way to feed an incremental pipeline from a source that
  * only ships full snapshots (the common case for vendor dumps and
  * warehouse exports feeding a training-data refresh).
  *
  * Shape: ONE full-outer equi-join on the key — no row compares outside
  * matching keys. Non-key columns ride as a single struct per side, so
  * the change test is one null-safe struct comparison (`<=>`) instead of
  * an O(columns) predicate re-planned per schema; unchanged rows are
  * dropped BEFORE the changelog leaves the join stage, so the output is
  * delta-sized, not snapshot-sized.
  *
  * At 100 TB: the join shuffles both snapshots on the key once — with
  * both snapshots bucketed by key on disk ([[Bucketing]]) even that
  * exchange disappears, which is how nightly-snapshot diffing stays
  * viable when a snapshot is the fact table. Deletes require genuinely
  * full snapshots on both sides; with append-only sources, filter to
  * I/U and diff only the affected partitions.
  */
object Cdc {

  /** The changelog turning `oldDf` into `newDf` (schemas must match).
    * Emits one row per changed key: `op` ∈ I (key only in new) / U (both,
    * any non-key column differs under null-safe equality) / D (key only
    * in old), with every non-key column twice as `old_*` / `new_*`
    * (null-padded on the absent side). Unchanged keys are dropped. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val cols = oldDf.columns.toSeq
    require(newDf.columns.toSeq == cols,
      s"snapshot schemas must match: $cols vs ${newDf.columns.toSeq}")
    val rest = cols.filterNot(keys.contains)
    require(rest.nonEmpty, "diff needs at least one non-key column")
    val o = oldDf.select(keys.map(col) :+
      struct(rest.map(col): _*).as("_old"): _*)
    val n = newDf.select(keys.map(col) :+
      struct(rest.map(col): _*).as("_new"): _*)
    // a key present on one side only yields a null struct on the other —
    // exactly the I/D discriminator, no presence flags needed
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("_old").isNull, "I")
          .when(col("_new").isNull, "D")
          .when(!(col("_old") <=> col("_new")), "U"))
      .where(col("op").isNotNull)
      .select(col("op") +: keys.map(col) ++:
        rest.flatMap(c => Seq(col(s"_old.$c").as(s"old_$c"),
          col(s"_new.$c").as(s"new_$c"))): _*)
  }
}
