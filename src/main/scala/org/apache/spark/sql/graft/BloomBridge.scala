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
    * false positives at the sized rate). Codegen'd. `might_contain`
    * requires its filter side to be a constant or a scalar subquery —
    * pass the one-row aggregate DataFrame and it rides in as the latter,
    * exactly the shape `InjectRuntimeFilter` builds: the subquery runs
    * once and its result enters the probe stage as a literal, so the
    * probe itself stays a map-side codegen'd predicate. */
  def might_contain(bloomDf: org.apache.spark.sql.DataFrame, h: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomDf.queryExecution.analyzed),
      ExpressionUtils.expression(h)))
}
