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
    * `InjectRuntimeFilter` builds for its scalar-subquery filters. */
  def might_contain(sketch: Array[Byte], h: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(sketch, org.apache.spark.sql.types.BinaryType),
      ExpressionUtils.expression(h)))
}
