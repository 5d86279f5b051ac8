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

  /** First-failing-rule funnel: tag every row with a `verdict` — the name
    * of the FIRST rule (in order) it violates, or "kept". The per-rule drop
    * attribution every curation pipeline reports ("how many documents did
    * each filter cost us?"), as one map-only expression: rules short-circuit
    * in a single codegen'd when-chain, so a 100 TB funnel costs one scan
    * regardless of rule count; the usual report is `groupBy("verdict")`.
    * Ordering matters and is the caller's contract: a row failing rules 2
    * and 4 is attributed to rule 2 (funnel semantics, not marginal counts —
    * [[profile]] gives the per-rule marginals). */
  def funnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("verdict",
      rules.foldRight(lit("kept")) { case ((name, bad), acc) =>
        when(bad, name).otherwise(acc)
      })

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
