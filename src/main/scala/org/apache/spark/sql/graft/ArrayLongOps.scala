package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native array→long kernels for the integer-quantized embedding tier
  * (round 16, guide §4): the catalog quantizes embeddings to exact
  * milli-longs and folds dots/norms with `transform`/`zip_with`/
  * `aggregate` higher-order functions, which execute as CodegenFallback
  * per ELEMENT — a corpus × panel scan pays an interpreted dispatch per
  * dimension per pair. These two expressions run the same arithmetic in
  * tight codegen'd loops. Values are IDENTICAL by construction (same op
  * sequence per element; long sums are order-invariant and both shapes
  * fold left-to-right).
  */

/** `transform(emb, x => floor(x·1000 + 0.5) :: long)` as one codegen'd
  * map: the catalog's exact milli quantization (Math.floor of an IEEE
  * double product — bit-identical to the HOF's Floor(Multiply(...))). */
case class QuantizeMilli(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_milli"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it via an object reference. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Math.floor(arr.getDouble(i) * 1000d + 0.5d).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantExpr", this, classOf[QuantizeMilli].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeMilli {
  /** Column-API entry point: `quantize_milli($"embedding")`. */
  def quantize_milli(emb: Column): Column =
    ExpressionUtils.column(QuantizeMilli(ExpressionUtils.expression(emb)))
}

/** `aggregate(zip_with(a, b, _*_), 0L, _+_)` over long arrays as one
  * codegen'd loop — the exact-integer dot product (and, with a = b, the
  * squared norm). Mirrors the HOF shape's edge case: unequal lengths
  * make zip_with pad with null and the fold returns NULL, so this
  * returns null there too (never silently truncates). */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Public so generated code can call it via an object reference;
    * returns null (boxed) on a length mismatch, like the HOF fold. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotExpr", this, classOf[DotLong].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}Box = $ref.compute($a, $b);
      if (${ev.value}Box == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Box.longValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Column-API entry point: `dot_long($"q", $"p_q")`. */
  def dot_long(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
