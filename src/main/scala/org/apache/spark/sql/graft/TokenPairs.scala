package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the adjacent word-pair stream of a
  * document — `[(w1,w2)]` structs for every consecutive token pair of
  * the single-space split, in order, non-distinct.
  *
  * Motivation (round 16, guide §4 "no interpreted expressions in the
  * hot path"): the DataFrame-composable shape —
  * `explode(when(size >= 2, transform(sequence(1, size-1), i =>
  * struct(element_at(toks,i), element_at(toks,i+1)))))` — runs the
  * lambda as CodegenFallback per ELEMENT per row, and evaluates
  * `split()` once per `element_at` under the interpreted path. Four
  * catalog queries (pmi, collocations, bigram_lm, kneser_ney) pay it on
  * every corpus scan; this kernel is one codegen'd map that splits once
  * and emits the pair array in a tight loop.
  *
  * EQUIVALENCE with the HOF shape: same single-space split (trailing
  * empties kept, limit -1 — `hashTokens`' convention), pairs at
  * positions (i, i+1) for i in [0, n-2] (the `sequence(1, size-1)` +
  * 1-based `element_at` positions), n < 2 → empty array, null text →
  * null (the downstream explode emits no rows either way — the HOF
  * shape's `otherwise(empty)` branch). Fields are never null, matching
  * `split()` semantics, so the queries' `isNotNull` no-op filters stay
  * no-ops.
  */
case class TokenPairs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "token_pairs"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it via an object reference. */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val u = new Array[UTF8String](n)
    var i = 0
    while (i < n) { u(i) = UTF8String.fromString(toks(i)); i += 1 }
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = new GenericInternalRow(
        Array[Any](u(i), u(i + 1))): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenPairsExpr", this, classOf[TokenPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenPairs {
  /** Column-API entry point: `token_pairs($"text")`. */
  def token_pairs(text: Column): Column =
    ExpressionUtils.column(TokenPairs(ExpressionUtils.expression(text)))
}
