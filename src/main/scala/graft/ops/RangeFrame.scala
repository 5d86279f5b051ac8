package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-immune trailing RANGE frames: evaluate time-range window
  * aggregates partitioned by `(key, time-chunk)` instead of by key alone.
  *
  * The problem this removes: `Window.partitionBy(key)` puts a key's WHOLE
  * history into one sort task, and AQE cannot split a window partition (a
  * range frame needs its partition complete) — a viral key whose history
  * rivals `total / parallelism` becomes the stage's straggler. The cure
  * exploits the frame's own bound: a trailing frame `[t − L, t]` can only
  * reach rows from the row's own L-wide time chunk (`t div L`) or the
  * chunk immediately before it. So each row is shuffled to its own chunk
  * as a RESULT row plus the next chunk as a CONTEXT row; within each
  * padded `(key, chunk)` group an ordinary range-frame window computes
  * exactly the true frame (context rows shape frames but are filtered
  * before emission, and can never double-count: a chunk's context rows
  * come from the disjoint time range of the previous chunk). A hot key's
  * timeline now splits across `span / L` independent tasks — the frame's
  * own time bound is what caps the irreducible per-task work (rows whose
  * frames genuinely overlap must meet in one task no matter the scheme).
  *
  * Cost vs the plain window: 2× shuffled rows and a wider shuffle key —
  * the flat price of making the stage's critical path `O(hottest chunk)`
  * instead of `O(hottest key)`. Aggregates must be frame-local
  * (count/sum/min/max/avg of the frame's rows — anything a range frame
  * computes row-at-a-time); ROW_NUMBER-style whole-partition functions
  * are out of scope by construction. Chunk assignment uses true FLOOR
  * division (`(t - pmod(t, L)) div L`, exact in integer arithmetic) — a
  * plain `t div L` truncates toward zero, which would merge `(-L, 0)`
  * and `[0, L)` into one chunk 0 and misalign context padding for
  * pre-epoch timestamps. Results are bit-identical to the
  * single-partition window, which `RangeFrameSpec` pins on a zipf corpus
  * against the plain formulation (including a negative-timestamp case).
  */
object RangeFrame {

  /** Append trailing-range aggregates over `[t − lookbackUs, t]` per
    * `partCol`, evaluated chunk-parallel. `aggs` are unfinished aggregate
    * columns (e.g. `sum(col("cents"))`, `min(when(cond, col("t")))`);
    * each is applied `.over` the padded chunk window and emitted under
    * its given name. Output = input columns + agg columns, original rows
    * only. */
  def trailing(df: DataFrame, partCol: String, tUsCol: String,
               lookbackUs: Long, aggs: Seq[(String, Column)]): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive: $lookbackUs")
    val keep = df.columns
    // Floor division, exact on longs: pmod is nonnegative, so subtracting
    // it lands on the chunk's floor multiple before the (now exact) div.
    val base = df.withColumn("__chunk",
      expr(s"($tUsCol - pmod($tUsCol, ${lookbackUs}L)) div ${lookbackUs}L"))
    val padded = base.withColumn("__ctx", lit(false))
      .unionByName(base.withColumn("__chunk", col("__chunk") + 1)
        .withColumn("__ctx", lit(true)))
    val w = Window.partitionBy(col(partCol), col("__chunk"))
      .orderBy(col(tUsCol))
      .rangeBetween(-lookbackUs, Window.currentRow)
    val withAggs = aggs.foldLeft(padded) { case (d, (name, agg)) =>
      d.withColumn(name, agg.over(w))
    }
    withAggs.filter(!col("__ctx"))
      .select((keep.map(col) ++ aggs.map { case (n, _) => col(n) }): _*)
  }
}
