package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the winnowing selection stream
  * (Schleimer et al. 2003) of a document — for every complete window of
  * `w` consecutive token-`k`-gram positions, the window's MINIMUM gram
  * string, in window order, non-distinct.
  *
  * Motivation (round 16, guide §4): the DataFrame shape —
  * `transform(sequence(...), i => concat_ws(" ", slice(toks, ...)))` to
  * build grams, then a second `transform` computing `array_min(slice)`
  * per window — is CodegenFallback per ELEMENT twice over, O(len·w)
  * interpreted dispatches per document; it measured as the dominant cost
  * of q_dedup_winnowing. This kernel is one codegen'd map: split once,
  * build each gram once, take window minima in a tight loop.
  *
  * EQUIVALENCE with the HOF shape (which the DuckDB oracle replays):
  * same single-space split (empties kept), gram i = tokens[i..i+k-1]
  * joined by " " (concat_ws keeps empty strings) for i in [0, n-k],
  * windows at gram positions [p-w+1, p] for p in [w, numGrams]
  * (1-based — the `sequence(w, size(g))` + `slice(g, p-w+1, w)`
  * positions), minimum by the binary UTF8 order `array_min` uses
  * (`UTF8String.compareTo`), n < k or numGrams < w → empty array, null
  * text → null (explode emits no rows either way).
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive: $k")
  require(w > 0, s"w must be positive: $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnowing_fingerprints"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it via an object reference. */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val numG = n - k + 1
    if (numG < w) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[UTF8String](numG)
    var i = 0
    while (i < numG) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      grams(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    val out = new Array[Any](numG - w + 1)
    var p = 0 // window start (0-based); window = grams[p .. p+w-1]
    while (p <= numG - w) {
      var min = grams(p)
      var j = 1
      while (j < w) {
        val c = grams(p + j)
        if (c.compareTo(min) < 0) min = c
        j += 1
      }
      out(p) = min
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowingFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingFingerprints {
  /** Column-API entry point: `winnowing_fingerprints($"text", 4, 4)`. */
  def winnowing_fingerprints(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowingFingerprints(ExpressionUtils.expression(text), k, w))
}
