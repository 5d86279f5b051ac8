package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: multi-dimensional data skipping for
  * parquet layouts.
  *
  * A single-column sort gives readers tight min/max stats — on that one
  * column only; filters on any other column skip nothing. Interleaving
  * the bits of two columns into one z-value and sorting by IT makes every
  * contiguous z-range a small rectangle in (x, y) space, so each written
  * file (and each row group inside it) carries tight min/max bounds on
  * BOTH columns, and predicates on either — or both — prune.
  *
  * Scale shape: one range shuffle on the z-value (sampled boundaries,
  * balanced output files) + a per-task sort, exactly like a linear
  * clustered write; the z-value is pure codegen'd bit arithmetic. This is
  * the optimize/cluster-by primitive of modern table formats, expressed
  * as plain Spark.
  */
object ZOrder {

  /** Morton code of two columns already quantized to `[0, 2^bits)`:
    * x occupies even bit positions, y odd. 2 × bits ≤ 63. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** One-pass (min, max) domain derivation for [[quantize]]: a single
    * aggregate over all clustering columns at once — 2N scalar results
    * from ONE scan, never one pass per column. This is the "derive them
    * once" half of the quantize contract: a layout JOB computes domains
    * one time (or takes them from table-level stats) and reuses them for
    * every batch it clusters, so the z-mapping stays identical across
    * incremental writes and re-clustering. Returns pairs in input order. */
  def deriveDomains(df: DataFrame, cols: String*): Seq[(Double, Double)] = {
    require(cols.nonEmpty, "deriveDomains needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
  }

  /** Quantize a numeric column to `[0, 2^bits)` for [[zValue]] — callers
    * supply the (min, max) domain so the mapping is deterministic and
    * identical across writes (derive them once, not per batch —
    * [[deriveDomains]] is the one-pass derivation).
    *
    * NULL propagates as NULL (it must not silently land in bucket 0 —
    * `greatest`/`least` skip nulls, so without the explicit branch a null
    * input would co-locate with the domain minimum and poison that
    * z-region's min/max bounds). Decide null placement upstream: filter
    * them out or assign an explicit bucket before clustering. */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, s"empty domain [$min, $max]")
    val buckets = (1L << bits) - 1
    when(c.isNull, lit(null))
      .otherwise(least(lit(buckets), greatest(lit(0L),
        floor((c.cast("double") - min) / (max - min) * buckets))))
  }

  /** Z-ordered parquet write: range-partition and sort by the interleaved
    * z-value of the two (pre-quantized) clustering columns, yielding
    * `nFiles` files whose min/max bounds are tight on both columns. */
  def writeZOrdered(df: DataFrame, dir: String, x: Column, y: Column,
                    bits: Int, nFiles: Int): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
}
