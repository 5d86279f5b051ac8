package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality profiling: null counts, domain violations, and
  * key uniqueness as one hash aggregate — every metric is a map-side
  * -combinable partial, so profiling a 100 TB table costs one scan and a
  * one-row-per-partition shuffle. The pipeline guardrail: run on each
  * ingest batch before publishing its partition.
  */
object Quality {

  /** One row of metrics: total rows, duplicate-key rows, and one violation
    * count per named predicate (predicates flag BAD rows). */
  def profile(df: DataFrame, keyCols: Seq[String],
              violations: Seq[(String, Column)]): DataFrame = {
    // struct equality, not string concatenation: concat_ws silently skips
    // NULL fields, so ("x", NULL), (NULL, "x") and a single-column "x" would
    // all collapse to the same key and inflate n_dup_keys on nullable keys.
    // countDistinct over a struct distinguishes NULL per field.
    val key = struct(keyCols.map(col): _*)
    val aggs =
      (count(lit(1)) - countDistinct(key)).as("n_dup_keys") +:
        violations.map { case (name, bad) =>
          sum(when(bad, 1L).otherwise(0L)).as(name)
        }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
