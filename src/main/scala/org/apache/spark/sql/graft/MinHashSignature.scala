package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/** Native Catalyst expression: MinHash signature of a text document.
  *
  * Tokenizes on single spaces, forms token `shingleN`-grams, and for each of
  * `perms` universal-hash functions `(a_i * h + b_i) mod (2^31 - 1)` keeps
  * the minimum over the document's gram hashes. One tight JVM loop per row.
  *
  * Why a custom expression instead of the DataFrame-composable shape
  * (`transform`/`slice` + explode + 32 `min()` aggregates): higher-order
  * -function lambdas are CodegenFallback — per-element interpreted dispatch
  * and boxing made shingling the dominant cost of near-dup detection
  * (measured 4-5x this expression's runtime at 5k docs). The window-lead
  * alternative is codegen'd but shuffles the entire token stream; at 100 TB
  * the shuffle IS the bottleneck. This kernel is narrow (no shuffle, no
  * generate): a scan emits `perms` longs per document, and only those tiny
  * signatures ever move.
  *
  * Coefficients are seeded deterministically, so signatures are stable
  * across runs and executors. Gram identity is a murmur3 mix of per-token
  * murmur3 hashes — no intermediate gram strings are allocated.
  */
case class MinHashSignature(child: Expression, shingleN: Int, perms: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // same silent-failure mode as TokenShingleHashes: grams floor at 1, so
  // shingleN <= 0 would give every document the SAME constant-gram
  // signature (the whole corpus becomes mutual near-duplicates), and
  // perms <= 0 an empty one — and SQL registration makes both reachable
  // by name. Fail at construction instead.
  require(shingleN > 0, s"shingleN must be positive: $shingleN")
  require(perms > 0, s"perms must be positive: $perms")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val prime = 2147483647L // 2^31 - 1
  // a in [1, 2^31-1], b in [0, 2^31-1): a*h + b <= (2^31-1)*(2^32-1) + 2^31
  // < 2^63 - 1, so the universal hash never overflows a long.
  private lazy val (coeffA, coeffB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(perms)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong)
    val b = Array.fill(perms)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it via an object reference. */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    // hash each token once; grams reuse these ints
    val th = new Array[Int](n)
    var i = 0
    while (i < n) { th(i) = MurmurHash3.stringHash(toks(i), 0x9747b28c); i += 1 }
    val mins = Array.fill(perms)(Long.MaxValue)
    // positions mirror slice(toks, i, shingleN): a doc shorter than one gram
    // still yields a single (short) gram
    val grams = math.max(n - (shingleN - 1), 1)
    var g = 0
    while (g < grams) {
      var h = 0x2e1b2197 // gram seed
      var j = g
      val end = math.min(g + shingleN, n)
      while (j < end) { h = MurmurHash3.mix(h, th(j)); j += 1 }
      val gh = MurmurHash3.finalizeHash(h, end - g).toLong & 0xffffffffL
      var p = 0
      while (p < perms) {
        val v = (coeffA(p) * gh + coeffB(p)) % prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      g += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-API entry point: `minhash_signature($"text")`. */
  def minhash_signature(text: Column, shingleN: Int = 3, perms: Int = 32): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(text), shingleN, perms))
}
