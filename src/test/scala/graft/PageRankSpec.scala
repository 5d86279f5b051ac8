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

  /** The integer recurrence run on the driver — the test oracle for
    * iteration counts far too deep to unroll in one Catalyst plan. */
  private def driverRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val R = 1000000000L; val d = 850000000L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nn = outdeg.size.toLong
    var r = outdeg.map { case (n, _) => n -> R / nn }
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, t) <- edges) contrib(t) += r(s) / outdeg(s)
      r = outdeg.map { case (n, _) => n -> ((R - d) / nn + d * contrib(n) / R) }
    }
    r
  }

  test("untilConverged stops at tolerance and matches the driver recurrence") {
    // Damping 0.85 contracts deltas geometrically (~0.85x per round on
    // this graph), so a micro-scale tolerance converges in the
    // production 50-100-iteration band — far deeper than fixedPoint can
    // unroll in one plan (110 unrolled levels StackOverflows task
    // serialization; that failure mode is WHY untilConverged exists).
    // Oracle: the same integer recurrence run on the driver.
    val base = (1L to 20L).map(l => (l % 7, l))
    val edgeSeq = base ++ base.map(_.swap)
    val edges = edgeSeq.toDF("src", "dst")
    val c = PageRank.untilConverged(edges, epsMicro = 1000L, maxIters = 200,
      checkpointEvery = 10)
    assert(c.deltaMicro <= 1000L, s"did not converge: delta=${c.deltaMicro}")
    assert(c.iters < 200, s"should converge well before maxIters: ${c.iters}")
    assert(c.iters >= 50, s"suspiciously fast for this graph: ${c.iters}")
    val got = c.ranks.orderBy("node").as[(Long, Long)].collect().toMap
    assert(got == driverRanks(edgeSeq, c.iters),
      s"segmented loop diverged from the recurrence at iter ${c.iters}")
  }

  test("untilConverged segments agree bit-for-bit with the unrolled plan") {
    // At a depth shallow enough to unroll, segmented (3+3+1) and
    // one-plan execution must give identical ranks: checkpointing may
    // truncate lineage, never change a value.
    val base = (1L to 20L).map(l => (l % 7, l))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val c = PageRank.untilConverged(edges, epsMicro = 0L, maxIters = 7,
      checkpointEvery = 3)
    assert(c.iters == 7, s"eps=0 must run to maxIters here: ${c.iters}")
    val got = c.ranks.orderBy("node").as[(Long, Long)].collect().toSeq
    val want = PageRank.fixedPoint(edges, iters = 7)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == want, "segmented != unrolled at equal iteration count")
  }

  test("untilConverged truncates lineage: plan depth bounded by the segment") {
    // 50 iterations with checkpointEvery=5 — without localCheckpoint the
    // final plan would unroll all rounds (hundreds of nodes); with it,
    // the result must sit on a checkpointed leaf a few nodes deep.
    val base = (1L to 30L).map(l => (l % 11, l))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val c = PageRank.untilConverged(edges, epsMicro = 0L,
      maxIters = 50, checkpointEvery = 5)
    val plan = c.ranks.queryExecution.optimizedPlan
    val depth = plan.numberedTreeString.linesIterator.size
    assert(plan.collectLeaves().forall(
      _.getClass.getSimpleName.contains("LogicalRDD")),
      s"result must read a checkpointed RDD leaf:\n$plan")
    assert(depth < 10, s"plan depth $depth suggests lineage was not truncated:\n$plan")
  }

  test("fixedPointLocal is bit-identical to fixedPoint on random bounded graphs") {
    // the r16 driver fast path must replay the EXACT recurrence —
    // including edge multiplicity in outdeg, dangling-dst drop, and the
    // integer div at every step — across several seeded random shapes
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val n = 5 + rnd.nextInt(20)
      val base = Seq.fill(40 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
      val iters = 1 + rnd.nextInt(8)
      val want = PageRank.fixedPoint(edges, iters)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      val got = PageRank.fixedPointLocal(edges, iters, maxEdges = 4096)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(got == want, s"trial $trial (n=$n iters=$iters): local != distributed")
    }
  }

  test("fixedPointLocal drops contributions to dst-only vertices, like the join plan") {
    // 1 -> 2 -> 3 directed chain: 3 never appears as src, so it is not a
    // node in either implementation and its inbound mass leaks (the
    // documented directed-list semantics)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val want = PageRank.fixedPoint(edges, iters = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val got = PageRank.fixedPointLocal(edges, iters = 4, maxEdges = 16)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq(1L, 2L), "dst-only vertex 3 must not appear")
  }

  test("fixedPointLocal refuses an over-cap graph instead of truncating") {
    val base = (1L to 40L).map(l => (l % 13, l))
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException](
      PageRank.fixedPointLocal(edges, iters = 2, maxEdges = 10))
    assert(e.getMessage.contains("bounded by construction"))
  }
}
