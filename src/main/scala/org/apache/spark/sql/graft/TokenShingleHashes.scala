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
    val th = TokenShingleHashes.hashTokens(text)
    val n = th.length
    // positions mirror slice(toks, i, shingleN): a doc shorter than one gram
    // still yields a single (short) gram
    val grams = math.max(n - (shingleN - 1), 1)
    val seen = new java.util.HashSet[java.lang.Long](grams * 2)
    val out = new Array[Long](grams)
    var m = 0
    var g = 0
    while (g < grams) {
      val h = TokenShingleHashes.gramHash(th, g, math.min(g + shingleN, n))
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

  /** 64-bit hash per whitespace token (two murmur seeds packed); the
    * shared kernel both shingle expressions build gram hashes from. */
  private[graft] def hashTokens(text: UTF8String): Array[Long] = {
    val toks = text.toString.split(" ", -1)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val lo = MurmurHash3.stringHash(toks(i), 0x9747b28c).toLong & 0xffffffffL
      val hi = MurmurHash3.stringHash(toks(i), 0x85ebca6b).toLong & 0xffffffffL
      th(i) = (hi << 32) | lo
      i += 1
    }
    th
  }

  /** Order-sensitive FNV mix over token hashes [g, end), finished with the
    * murmur3 fmix64 avalanche so band/bucket arithmetic downstream sees
    * uniform bits. Equal gram strings always collide; unequal grams
    * collide with p ~ 2^-64. */
  private[graft] def gramHash(th: Array[Long], g: Int, end: Int): Long = {
    var h = 0xcbf29ce484222325L // FNV-64 offset basis as the gram seed
    var j = g
    while (j < end) { h = (h ^ th(j)) * 0x100000001b3L; j += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}

/** Positional sibling of [[TokenShingleHashes]] for exact-substring
  * detection: the hash of EVERY `shingleN`-token window in positional
  * order — element i is the hash of tokens [i, i+shingleN), no
  * de-duplication, and a document shorter than `shingleN` tokens yields an
  * EMPTY array (it cannot contain a run of `shingleN` tokens), unlike the
  * distinct variant's floor-at-one-short-gram contract.
  *
  * `posexplode` over the result gives the (pos, anchor-hash) stream
  * substring dedup joins on: a shared token run of length R >= shingleN
  * appears as exactly R - shingleN + 1 anchor matches at consecutive
  * positions on one alignment diagonal (pos_a - pos_b constant), which is
  * what lets run extension be pure relational gaps-and-islands instead of
  * string comparison ([[graft.ops.SubstringDedup]]). Same hashing as the
  * distinct variant, so both surfaces agree on gram identity. */
case class TokenShinglePosHashes(child: Expression, shingleN: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(shingleN > 0, s"shingleN must be positive: $shingleN")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_pos_hashes"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it via an object reference. */
  def compute(text: UTF8String): ArrayData = {
    val th = TokenShingleHashes.hashTokens(text)
    val n = th.length
    val grams = math.max(n - (shingleN - 1), 0)
    val out = new Array[Long](grams)
    var g = 0
    while (g < grams) {
      out(g) = TokenShingleHashes.gramHash(th, g, g + shingleN)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglePosHashExpr", this,
      classOf[TokenShinglePosHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShinglePosHashes {
  /** Column-API entry point: `token_shingle_pos_hashes($"text", 50)`. */
  def token_shingle_pos_hashes(text: Column, shingleN: Int): Column =
    ExpressionUtils.column(
      TokenShinglePosHashes(ExpressionUtils.expression(text), shingleN))
}
