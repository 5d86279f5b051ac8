package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Native Catalyst expression: Hilbert-curve distance of a grid cell
  * `(x, y) ∈ [0, 2^bits)²` — the xy2d recurrence (one rotate-and-
  * accumulate step per bit level, top bit first) as a tight codegen'd
  * loop.
  *
  * Why an Expression and not a Column fold: the recurrence REBINDS x and
  * y every level (the quadrant rotation), so a declarative fold must
  * reference each level's x/y several times — and Catalyst expression
  * trees have no sharing, so 12 levels of 5-way reuse explode to ~5¹²
  * nodes and OOM the driver at plan build (measured — this replaced
  * exactly that). A loop with mutable locals is the honest shape of the
  * algorithm; `doGenCode` keeps it inside whole-stage codegen, so a
  * 100 TB clustering write pays one JIT'd loop per row, no UDF boundary.
  *
  * `bits` is a construction-time constant (codegen specializes the loop
  * bound), mirroring `MinHashSignature`'s contract.
  */
case class HilbertDistance(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertDistance.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
        long $x = $a & ${(1L << bits) - 1}L, $y = $b & ${(1L << bits) - 1}L, $d = 0L;
        for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
          long $rx = (($x & $s) > 0) ? 1L : 0L;
          long $ry = (($y & $s) > 0) ? 1L : 0L;
          $d += $s * $s * ((3L * $rx) ^ $ry);
          if ($ry == 0L) {
            if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
            long $t = $x; $x = $y; $y = $t;
          }
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertDistance {
  /** Interpreted-path / reference kernel (codegen inlines the same loop).
    *
    * Inputs are masked to the grid (`& (2^bits − 1)`): bits above the
    * level loop are never consumed by the recurrence, so an unmasked
    * out-of-domain coordinate would silently alias another cell's key.
    * Masking makes the aliasing explicit and total — callers that need
    * true clamping (values beyond the grid pinned to the edge rather
    * than wrapped) should quantize first, as `ZOrder.quantize` does. */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var (x, y, d) = (x0 & mask, y0 & mask, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-API entry point: `hilbert_d($"x", $"y", bits)`. */
  def hilbert_d(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(HilbertDistance(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))
}
