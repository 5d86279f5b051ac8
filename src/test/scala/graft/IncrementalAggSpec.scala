package graft

import graft.ops.{Cdc, IncrementalAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))

  private def refreshVia(v1: DataFrame, v2: DataFrame): DataFrame = {
    val delta = IncrementalAgg.deltaContributions(
      Cdc.diff(v1, v2, Seq("k")),
      oldGroup = col("old_g"), newGroup = col("new_g"),
      oldVal = col("old_v"), newVal = col("new_v"))
    IncrementalAgg.refresh(agg(v1), delta, "g", "n", "sv")
  }

  test("refresh handles value updates, group migration, birth and death") {
    val v1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "g", "v")
    val v2 = Seq(
      (1L, "a", 15L),  // value update within group
      (2L, "c", 20L),  // migrates a -> c (group c is born)
      // 3 deleted -> group b dies
      (4L, "a", 40L))  // insert
      .toDF("k", "g", "v")
    val got = refreshVia(v1, v2).orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 55L), ("c", 1L, 20L)))
  }

  test("incremental refresh equals direct re-aggregation on real data") {
    val dir = "/root/testdata/sf0.001"
    val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
    val v1 = queries.tbl(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("g"),
        cents.as("v"))
    // a denser delta than the catalog query's: touch every 3rd key
    val v2 = v1.filter(col("k") % 5 =!= 0)
      .withColumn("v", when(col("k") % 3 === 0, col("v") + 7L).otherwise(col("v")))
      .withColumn("g", when(col("k") % 9 === 0, lit("Z")).otherwise(col("g")))
      .unionByName(v1.filter(col("k") % 11 === 0)
        .withColumn("k", col("k") + 500000L))
    val inc = refreshVia(v1, v2).orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    val direct = agg(v2).orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(inc == direct && inc.nonEmpty)
  }

  test("no-op changelog leaves the aggregate untouched") {
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v")
    val got = refreshVia(v1, v1).orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 10L), ("b", 1L, 20L)))
  }
}
