package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Co-located join via bucketing — the 100 TB layout story: a fact table
  * bucketed by its join key joins a same-bucketed dimension with ZERO
  * shuffle exchanges (both sides' output partitioning already satisfies the
  * join's distribution requirement). At scale this turns the nightly
  * fact-fact join from the dominant network cost into a local merge.
  */
class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("join on the bucket key plans without a shuffle exchange") {
    import spark.implicits._
    // Disable broadcast so the join would otherwise need a full shuffle.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1L to 1000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "v")
      val dims = (0L to 96L).map(i => (i, s"name_$i")).toDF("k", "name")
      facts.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("facts_b")
      dims.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("dims_b")

      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
        .groupBy("name").agg(sum("v").as("sv"))
      val n = joined.count()
      assert(n == 97)
      val plan = joined.queryExecution.executedPlan
      // the groupBy("name") aggregation legitimately shuffles; the join must not
      val joinShuffles = collectWithSubqueries(plan) {
        case e: ShuffleExchangeExec => e
      }
      assert(joinShuffles.size <= 1,
        s"expected only the post-join aggregate shuffle, got:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("ensureBucketed refuses to reuse a table with a different bucket spec") {
    import spark.implicits._
    import graft.ops.Bucketing
    val df = (1L to 100L).map(i => (i % 7, i)).toDF("k", "id")
    try {
      Bucketing.ensureBucketed(spark, "spec_guard_b", df, buckets = 4, key = "k")
      // same spec: silent reuse
      Bucketing.ensureBucketed(spark, "spec_guard_b", df, buckets = 4, key = "k")
      // different bucket count or key: loud refusal, not wrong-layout reuse
      val e1 = intercept[IllegalArgumentException](
        Bucketing.ensureBucketed(spark, "spec_guard_b", df, buckets = 8, key = "k"))
      assert(e1.getMessage.contains("different bucket spec"))
      val e2 = intercept[IllegalArgumentException](
        Bucketing.ensureBucketed(spark, "spec_guard_b", df, buckets = 4, key = "id"))
      assert(e2.getMessage.contains("different bucket spec"))
    } finally spark.sql("DROP TABLE IF EXISTS spec_guard_b")
  }

  test("ensureBucketed refuses a table bucketed on a SUPERSET of the key") {
    import spark.implicits._
    import graft.ops.Bucketing
    val df = (1L to 100L).map(i => (i % 7, i)).toDF("k", "id")
    try {
      // pre-existing table bucketed on [k, id]: its output partitioning is
      // HashPartitioning(k, id) which does NOT satisfy a join on k alone —
      // a substring match on the rendered column list would wrongly accept it
      df.write.bucketBy(4, "k", "id").sortBy("k", "id")
        .mode("overwrite").saveAsTable("superset_guard_b")
      val e = intercept[IllegalArgumentException](
        Bucketing.ensureBucketed(spark, "superset_guard_b", df, buckets = 4, key = "k"))
      assert(e.getMessage.contains("different bucket spec"))
    } finally spark.sql("DROP TABLE IF EXISTS superset_guard_b")
  }

  test("parseBucketColumns extracts the exact column list") {
    import graft.ops.Bucketing.parseBucketColumns
    assert(parseBucketColumns("[`k`]") == Seq("k"))
    assert(parseBucketColumns("[`k`, `id`]") == Seq("k", "id"))
    assert(parseBucketColumns("[]") == Seq.empty)
    // fallback: a Spark version rendering the list unquoted must still
    // parse (else every valid existing table would be falsely refused)
    assert(parseBucketColumns("[k]") == Seq("k"))
    assert(parseBucketColumns("[k, id]") == Seq("k", "id"))
  }

  test("tableSuffix is collision-free where sanitization alone is not") {
    import graft.ops.Bucketing.tableSuffix
    // these sanitize to the same identifier; the hash keeps them apart
    assert(tableSuffix("/data/sf0.1") != tableSuffix("/data/sf0_1"))
    assert(tableSuffix("/data/sf0.1") == tableSuffix("/data/sf0.1"))
  }
}
