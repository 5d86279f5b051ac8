package graft

import graft.ops.Sampling
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** A-ES weighted reservoir: selection semantics (k smallest priorities,
  * weight-monotone inclusion), determinism across partitionings, and the
  * no-shuffle TakeOrderedAndProject plan contract. */
class ReservoirSampleSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def docs(nParts: Int) = spark.sparkContext
    .parallelize((1L to 1000L).map(i => (i, 10L + (i % 91))), nParts)
    .toDF("id", "w")

  test("selects exactly the k smallest priorities, stable across partitioning") {
    val a = Sampling.weightedReservoir(docs(3), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedReservoir(docs(17), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(a.size == 50)
    // brute force: recompute every priority, take the 50 smallest
    val all = Sampling.weightedReservoir(docs(3), "id", "w", k = 1000)
      .select("id", "priority").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expect = all.sortBy { case (id, p) => (p, id) }.take(50)
      .map(_._1).toSet
    assert(a == expect)
  }

  test("inclusion probability grows with weight (rank-sum check)") {
    // same ids hashed identically, but weight 10x for the top half: the
    // heavy half must dominate a 200-of-1000 sample
    val df = spark.sparkContext
      .parallelize((1L to 1000L).map(i => (i, if (i > 500) 1000L else 100L)), 5)
      .toDF("id", "w")
    val picked = Sampling.weightedReservoir(df, "id", "w", k = 200)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ > 500)
    assert(heavy > 140, s"heavy-weight rows under-sampled: $heavy/200")
  }

  test("k larger than the table returns every row") {
    assert(Sampling.weightedReservoir(docs(4), "id", "w", k = 5000)
      .count() == 1000L)
  }

  test("catalog query plans as TakeOrderedAndProject with no shuffle") {
    val df = SparkEntry.queries("q_sample_reservoir")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan
    // the limit+sort must be the bounded-heap operator...
    val tops = collect(plan) { case t: TakeOrderedAndProjectExec => t }
    assert(tops.nonEmpty, s"expected TakeOrderedAndProject:\n$plan")
    // ...and nothing below it may shuffle the corpus (the final orderBy
    // of the 200 output rows is allowed above it)
    assert(collect(tops.head: org.apache.spark.sql.execution.SparkPlan) {
      case e: ShuffleExchangeExec => e
    }.isEmpty, "corpus-side shuffle under the top-k operator")
  }
}
