package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-API bridge for Spark's OWN Bloom-filter sketch pair —
  * `BloomFilterAggregate` / `BloomFilterMightContain`, the expressions
  * Catalyst's `InjectRuntimeFilter` builds runtime join filters from.
  * They are not in the public function registry (Spark reserves them for
  * the optimizer), but they are exactly the right primitive for an
  * EXPLICIT corpus-lifecycle membership sketch: hardened TypedImperative
  * aggregate with map-side partial merge, codegen'd probe, spill-safe
  * binary buffer. Re-implementing a Bloom filter as a UDAF would be
  * strictly worse on every axis.
  *
  * Lives under `org.apache.spark.sql` because Spark 4 scopes the
  * Column <-> Expression bridge (`classic.ExpressionUtils`) as
  * `private[sql]` — the same placement as [[CosineSimilarity]].
  */
object BloomBridge {

  /** Aggregate a LONG column (hash the key first — `xxhash64(...)`) into
    * a serialized Bloom filter sized for `estItems` items in `numBits`
    * bits. One binary value out; merge is map-side associative. */
  def bloom_filter_agg(h: Column, estItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(h), Literal(estItems), Literal(numBits))
      .toAggregateExpression())

  /** Probe: true if `h` MIGHT be in the filter (no false negatives;
    * false positives at the sized rate). `might_contain` requires its
    * filter side to be a constant or a scalar subquery; a fit-once
    * sketch artifact enters as a binary LITERAL (referenced as a plan
    * object, not inlined in generated source), so the probe is a
    * map-side codegen'd predicate — the same runtime shape
    * `InjectRuntimeFilter` builds for its scalar-subquery filters.
    *
    * SCALE WARNING (measured, round 13): a plan LITERAL ships inside
    * the serialized plan of EVERY task and is re-hashed by every plan
    * compare — a 4 MiB sketch literal cost `q_dedup_bloom` 4.3× its pin
    * (1.7 s → 7.4 s at sf0.1, ~100 tasks × 4 MiB of per-task payload).
    * Use [[might_contain_bcast]] for fit-once artifacts: the broadcast
    * ships once per EXECUTOR over torrent, and tasks carry only the
    * handle. This literal form remains correct for small sketches and
    * for tests. */
  def might_contain(sketch: Array[Byte], h: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(sketch, org.apache.spark.sql.types.BinaryType),
      ExpressionUtils.expression(h)))

  /** [[might_contain]] over a BROADCAST sketch — the fit-once corpus
    * artifact shape: tasks serialize the broadcast HANDLE (bytes ship
    * once per executor), and each task lazily deserializes the filter
    * from the executor-local value. */
  def might_contain_bcast(sketch: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                          h: Column): Column =
    ExpressionUtils.column(BloomMightContainBcast(
      sketch, ExpressionUtils.expression(h)))
}

/** Codegen'd Bloom probe against a broadcast-distributed serialized
  * filter. The expression serializes with the TASK, so it must carry
  * only the broadcast handle; the filter itself deserializes lazily from
  * the executor-local broadcast value (one torrent fetch per executor,
  * one `readFrom` per task — milliseconds, vs megabytes of per-task
  * literal payload for the [[BloomBridge.might_contain]] form). */
case class BloomMightContainBcast(
    bcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bcast"

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bcast.value))

  /** Probe kernel — public so generated code can call it through the
    * codegen reference array. */
  def test(h: Long): Boolean = filter.mightContainLong(h)

  override def nullSafeEval(h: Any): Any = test(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomMightContainBcast].getName)
      s"${ev.value} = $ref.test($c);"
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
