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

  /** Bin width derived from the DATA instead of a caller constant.
    *
    * The cost model: with mean interval length W and point density rho
    * (points per second over the observed span), a bin width b costs
    * ~|I|*(W/b + 1) exploded interval rows plus ~|I|*rho*(W + b)
    * equi-join candidates — wide bins don't fan intervals out but sweep
    * in a bin's worth of unrelated points per interval; narrow bins
    * approach the true-match floor |I|*rho*W at the price of fan-out.
    * The total is minimized at b* = sqrt(W / rho): as density grows k×
    * (the 30× scale-up grew BOTH sides in a fixed time span), the right
    * bin width shrinks by sqrt(k) — a constant tuned at one SF is
    * guaranteed wrong at another, which is exactly what the sf3 sweep
    * measured (within-bin candidate volume ~1.75x above the floor at a
    * constant W-sized bin).
    *
    * b* is clamped to [W/1024, W]: the lower clamp bounds fan-out at
    * ~1025 rows per interval regardless of density; the upper keeps the
    * historical "bin ≈ interval length" behavior for sparse data.
    *
    * The stats pass is two single-row aggregates (avg interval length;
    * point count + span) — column-pruned scans, the same derive-once
    * trade as z-order's quantization domains: a repeatedly-run layout
    * job should compute them once and call [[pointInInterval]] with the
    * result; this entry point is the self-tuning convenience for
    * one-shot queries. Degenerate stats (no rows, zero-length intervals,
    * zero span) fall back to `fallbackBinSeconds`. */
  def adaptiveBinSeconds(points: DataFrame, ptCol: String,
                         intervals: DataFrame, startCol: String, endCol: String,
                         fallbackBinSeconds: Long = 86400L): Long = {
    val iv = intervals.agg(
      avg(col(endCol).cast("timestamp").cast("long") -
        col(startCol).cast("timestamp").cast("long")).as("w")).head()
    val pt = points.agg(
      count(lit(1)).as("n"),
      (max(col(ptCol).cast("timestamp").cast("long")) -
        min(col(ptCol).cast("timestamp").cast("long"))).as("span")).head()
    val w = if (iv.isNullAt(0)) 0.0 else iv.getDouble(0)
    val n = pt.getLong(0)
    val span = if (pt.isNullAt(1)) 0L else pt.getLong(1)
    if (w <= 0.0 || n == 0L || span <= 0L) fallbackBinSeconds
    else {
      val rho = n.toDouble / span
      val bStar = math.sqrt(w / rho)
      math.max(1L, math.min(w, math.max(w / 1024.0, bStar)).round)
    }
  }

  /** [[pointInInterval]] with the bin width chosen by
    * [[adaptiveBinSeconds]] from the inputs' own statistics. */
  def pointInIntervalAdaptive(points: DataFrame, ptCol: String,
                              intervals: DataFrame, startCol: String,
                              endCol: String,
                              fallbackBinSeconds: Long = 86400L): DataFrame =
    pointInInterval(points, ptCol, intervals, startCol, endCol,
      adaptiveBinSeconds(points, ptCol, intervals, startCol, endCol,
        fallbackBinSeconds))
}
