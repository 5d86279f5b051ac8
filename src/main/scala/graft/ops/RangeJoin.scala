package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop plan.
  *
  * Spark plans a pure inequality join (`p.ts BETWEEN i.start AND i.end`)
  * as BroadcastNestedLoopJoin / CartesianProduct — O(|points| ×
  * |intervals|) comparisons, a non-starter at scale. The standard fix
  * (used by range-join hints in other engines) is binning: quantize time
  * into fixed-width bins, explode each interval onto the bins it
  * overlaps, map each point to its single bin, equi-join on the bin, and
  * re-check the exact predicate. Every (interval, point) match meets in
  * exactly one bin — the point's — so results are exact with no dedup
  * step.
  *
  * Scale shape: the plan becomes a shuffle hash / sort-merge equi-join on
  * the bin id; candidate pairs are |matches| + near-miss pairs sharing a
  * bin, linear for bin widths near the interval length. Interval fan-out
  * is `len/binSeconds + 1` rows (pick binSeconds ≈ the typical interval
  * length); hot bins are ordinary join skew, handled by AQE.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `points.ptCol` falls in
    * `[startCol, endCol)`. Columns from both sides survive; timestamps
    * are compared at their native precision. Malformed intervals
    * (end before start) match nothing: their bin rows exist (sequence
    * steps down) but the exact recheck is vacuously false. */
  /** Bin id of a timestamp. The intermediate cast("timestamp") lets NTZ
    * timestamps bin too (NTZ -> BIGINT is not a legal direct cast);
    * session TZ is UTC. Public so measurement code (ScaleProbeMain's
    * candidate count) uses THIS binning, not a hand-rolled copy that
    * could drift. */
  def bin(ts: Column, binSeconds: Long): Column =
    floor(ts.cast("timestamp").cast("long") / binSeconds)

  /** The equi-join candidate set before the exact recheck — the join the
    * shuffle actually pays for. Exposed for measurement. */
  def candidates(points: DataFrame, ptCol: String,
                 intervals: DataFrame, startCol: String, endCol: String,
                 binSeconds: Long): DataFrame = {
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol), binSeconds), bin(col(endCol), binSeconds))))
    val pt = points.withColumn("__bin", bin(col(ptCol), binSeconds))
    pt.join(iv, Seq("__bin"))
  }

  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binSeconds: Long): DataFrame =
    candidates(points, ptCol, intervals, startCol, endCol, binSeconds)
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
}
