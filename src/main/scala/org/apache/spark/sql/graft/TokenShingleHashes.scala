package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/** Native Catalyst expression: distinct 64-bit hashes of a document's token
  * `shingleN`-grams (whitespace-token shingles, single-space split — the
  * same tokenization as [[graft.ops.Dedup.tokenShingles]]).
  *
  * Motivation (contamination sweeps, n-gram overlap joins): the
  * DataFrame-composable shape — `transform`/`slice`/`concat_ws` +
  * `array_distinct`, then join on the gram STRING — loses three ways at
  * corpus scale: HOF lambdas are CodegenFallback (per-element interpreted
  * dispatch made shingling the dominant cost, which forced a session-
  * lifetime `persist()` to avoid computing it twice); gram strings are
  * materialized (~40 bytes each) and then shuffled as join keys; and the
  * only fix for the double-compute was caching an exploded frame LARGER
  * than the corpus — exactly what you cannot do at 100 TB. This kernel is
  * a narrow codegen'd map (no shuffle, no generate): recomputing it per
  * consumer is cheaper than caching its output, and the join key it emits
  * is 8 bytes.
  *
  * Hashing: per-token murmur3 at two seeds packed into 64 bits, mixed
  * per-gram FNV-style (order-sensitive) with a murmur-style finalizer.
  * Equal gram strings always collide (same bytes → same hash); unequal
  * grams collide with p ≈ 2^-64, so an overlap count over hashes equals
  * the count over strings except with probability ~n²/2^65 per corpus —
  * negligible against any data-quality signal. Output order is first
  * occurrence, mirroring `array_distinct`; null text yields null (the
  * downstream explode drops the row, matching the HOF pipeline).
  */
case class TokenShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // validate here, not only in callers: a direct construction with
  // shingleN <= 0 would otherwise silently emit one constant-hash gram
  // per document (grams = max(n - (shingleN-1), 1) floors at 1)
  require(shingleN > 0, s"shingleN must be positive: $shingleN")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it via an object reference. */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    // hash each token once (64 bits from two murmur seeds); grams reuse these
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val lo = MurmurHash3.stringHash(toks(i), 0x9747b28c).toLong & 0xffffffffL
      val hi = MurmurHash3.stringHash(toks(i), 0x85ebca6b).toLong & 0xffffffffL
      th(i) = (hi << 32) | lo
      i += 1
    }
    // positions mirror slice(toks, i, shingleN): a doc shorter than one gram
    // still yields a single (short) gram
    val grams = math.max(n - (shingleN - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](grams * 2)
    val out = new Array[Long](grams)
    var m = 0
    var g = 0
    while (g < grams) {
      var h = 0xcbf29ce484222325L // FNV-64 offset basis as the gram seed
      var j = g
      val end = math.min(g + shingleN, n)
      while (j < end) { h = (h ^ th(j)) * 0x100000001b3L; j += 1 }
      // murmur3 fmix64 finalizer: avalanches the FNV mix so band/bucket
      // arithmetic downstream sees uniform bits
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      if (seen.add(h)) { out(m) = h; m += 1 }
      g += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashExpr", this, classOf[TokenShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingleHashes {
  /** Column-API entry point: `token_shingle_hashes($"text", 5)`. */
  def token_shingle_hashes(text: Column, shingleN: Int): Column =
    ExpressionUtils.column(
      TokenShingleHashes(ExpressionUtils.expression(text), shingleN))
}
