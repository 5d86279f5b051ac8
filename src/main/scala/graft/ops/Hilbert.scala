package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering: the locality upgrade over [[ZOrder]]'s
  * Morton interleave for multi-dimensional data skipping.
  *
  * Both curves map a 2-D grid cell to a 1-D key so a clustered write
  * gives every file tight min/max bounds on both columns. The difference
  * is CONTINUITY: the Z-curve jumps across the grid at every power-of-two
  * boundary (cell 0b0111→0b1000 teleports diagonally), so some key ranges
  * span wide rectangles; the Hilbert curve moves one grid step per key
  * step — adjacent keys are ALWAYS adjacent cells — so every contiguous
  * key range is a compact blob and per-file bounds are uniformly tight,
  * not tight-on-average. This is why the optimize/cluster-by tier of
  * modern lakehouse engines offers Hilbert above Z-order.
  *
  * The key is the textbook xy2d loop (one rotate-and-accumulate step per
  * bit level, top bit first), run as the native codegen'd
  * [[org.apache.spark.sql.graft.HilbertDistance]] expression — the
  * recurrence rebinds (x, y) every level, and a declarative Column fold
  * has no subexpression sharing, so 12 levels of 5-way reuse explode to
  * ~5¹² tree nodes and OOM plan build (measured); a JIT'd loop with
  * mutable locals inside whole-stage codegen is the honest shape. The
  * same chain IS still emitted declaratively per level by [[levelSql]] —
  * for the DuckDB oracle, where CTE levels materialize and sharing is
  * free — so the KEY MATH itself is replayed step for step (unlike the
  * Z-order entry, whose layout oracle pins constants).
  *
  * Scale shape: identical to Z-order — the key is map-side bit
  * arithmetic; a clustered write is one sampled range shuffle + per-task
  * sort. The curve choice changes read-side pruning, not write cost.
  */
object Hilbert {

  /** Hilbert distance of a cell `(x, y)` already quantized to
    * `[0, 2^bits)²` — the native codegen'd xy2d loop. */
  def dValue(x: Column, y: Column, bits: Int = 12): Column =
    org.apache.spark.sql.graft.HilbertDistance
      .hilbert_d(x.cast("long"), y.cast("long"), bits)

  /** Reference scalar implementation — the expression's own interpreted
    * kernel, re-exported for spec use. */
  def dValueScalar(x0: Long, y0: Long, bits: Int = 12): Long =
    org.apache.spark.sql.graft.HilbertDistance.xy2d(x0, y0, bits)

  /** One xy2d level as a DuckDB CTE body: reads columns `(d, x, y)` from
    * CTE `prev`, emits the same names (plus pass-through `cols`). The
    * generated chain replays [[dValue]]'s fold literally — same bitwise
    * ops, same CASE branches. */
  def levelSql(prev: String, lvl: Int, cols: Seq[String]): String = {
    val s = 1L << lvl
    val pass = cols.map(c => s"$c, ").mkString
    s"""SELECT $pass
       d + ${s * s} * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
                          (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d,
       CASE WHEN (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) = 0
            THEN (CASE WHEN (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END) = 1
                       THEN ${s - 1} - y ELSE y END)
            ELSE x END AS x,
       CASE WHEN (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) = 0
            THEN (CASE WHEN (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END) = 1
                       THEN ${s - 1} - x ELSE x END)
            ELSE y END AS y
       FROM $prev"""
  }

  /** The full per-level CTE chain `h<bits-1> .. h0`, starting from a CTE
    * named `q` exposing `(d, x, y)` plus `cols`; the final key is `h0.d`. */
  def chainSql(bits: Int, cols: Seq[String]): String =
    (bits - 1 to 0 by -1).map { lvl =>
      val prev = if (lvl == bits - 1) "q" else s"h${lvl + 1}"
      s"h$lvl AS (${levelSql(prev, lvl, cols)})"
    }.mkString(",\n         ")

  /** Inverse curve walk (d2xy): the cell at Hilbert distance `d`. Used
    * by [[rectRanges]]' block descent and pinned against [[dValue]] as a
    * round-trip in HilbertSpec. */
  def d2xy(d0: Long, bits: Int = 12): (Long, Long) = {
    var (x, y, t) = (0L, 0L, d0)
    var s = 1L
    val n = 1L << bits
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  /** READ-side pruning: decompose an inclusive query rectangle
    * `[xlo, xhi] × [ylo, yhi]` into Hilbert-KEY ranges, so a reader with
    * per-file (or per-row-group) key min/max stats scans only files
    * whose key span intersects a range — the query half of clustered
    * layouts (the write half is [[writeClustered]]).
    *
    * The descent exploits the curve's defining alignment property:
    * every aligned key block `[m·4^k, (m+1)·4^k)` occupies exactly one
    * axis-aligned `2^k × 2^k` square. Blocks fully inside the rect emit
    * as whole ranges; disjoint blocks drop; partial blocks split into
    * their 4 children. `maxRanges` bounds the answer for the planner —
    * on budget exhaustion a partial block emits whole (an
    * OVER-approximation: pruning stays correct, merely less tight).
    * Driver-side, O(output · bits); adjacent ranges merge on emission
    * (Hilbert continuity is why the count stays small — a Z-curve
    * decomposition of the same rect fragments at every seam). Returns
    * inclusive `(lo, hi)` key ranges in ascending order. */
  def rectRanges(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                 bits: Int = 12, maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(xlo <= xhi && ylo <= yhi, "empty query rectangle")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def emit(lo: Long, hi: Long): Unit =
      if (out.nonEmpty && out.last._2 + 1 == lo)
        out(out.size - 1) = (out.last._1, hi) // merge adjacent
      else out += ((lo, hi))
    // blocks in ASCENDING key order so emission merges greedily
    def descend(base: Long, k: Int): Unit = {
      val side = 1L << k
      val (cx, cy) = d2xy(base, bits)
      val (bx, by) = (cx & ~(side - 1), cy & ~(side - 1))
      val disjoint = bx + side - 1 < xlo || bx > xhi ||
        by + side - 1 < ylo || by > yhi
      if (!disjoint) {
        val inside = bx >= xlo && bx + side - 1 <= xhi &&
          by >= ylo && by + side - 1 <= yhi
        if (inside || k == 0 || out.size >= maxRanges)
          emit(base, base + side * side - 1) // whole block (exact or over-approx)
        else {
          val q = side * side / 4
          var i = 0
          while (i < 4) { descend(base + i * q, k - 1); i += 1 }
        }
      }
    }
    descend(0L, bits)
    out.toSeq
  }

  /** Hilbert-clustered parquet write — same write shape as
    * [[ZOrder.writeZOrdered]], keyed by the Hilbert distance. */
  def writeClustered(df: DataFrame, dir: String, x: Column, y: Column,
                     bits: Int, nFiles: Int): Unit =
    df.withColumn("__h", dValue(x, y, bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode(SaveMode.Overwrite).parquet(dir)
}
