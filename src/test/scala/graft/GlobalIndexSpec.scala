package graft

import graft.ops.GlobalIndex
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global contiguous numbering: agreement with the (single-task) window
  * spelling, stability across input partitionings, and the plan contract
  * that the catalog query contains NO unpartitioned window. */
class GlobalIndexSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // non-monotonic ids with gaps, so "sorted input" can't mask bugs
  private def rows(nParts: Int) = spark.sparkContext
    .parallelize(new scala.util.Random(11)
      .shuffle((1 to 2000).map(i => i.toLong * 7 % 4001))
      .distinct.map(id => (id, s"v$id")), nParts)
    .toDF("id", "payload")

  test("indexes are exactly row_number()-1 in id order") {
    val got = GlobalIndex.withGlobalIndex(rows(5), "id")
      .select("id", "global_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = rows(5)
      .withColumn("w", row_number().over(Window.orderBy("id")) - 1)
      .select("id", "w").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    assert(got == expect)
  }

  test("contiguous 0..n-1 and stable across input partitionings") {
    val a = GlobalIndex.withGlobalIndex(rows(3), "id")
    val idxs = a.select("global_idx").as[Long].collect().sorted
    assert(idxs.toSeq == (0L until idxs.length).toSeq, "not contiguous")
    val b = GlobalIndex.withGlobalIndex(rows(23), "id")
      .select("id", "global_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b == a.select("id", "global_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet,
      "ids depend on input partitioning")
  }

  test("catalog query has no unpartitioned window over the corpus") {
    val df = SparkEntry.queries("q_global_index")(
      spark, "/root/testdata/sf0.001")
    val windows = collect(df.queryExecution.executedPlan) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(windows.isEmpty, "single-task global window in the plan")
    // and the result matches the oracle shape
    val out = df.collect()
    assert(out.length == 500)
    assert(out.map(_.getLong(2)).sorted.toSeq == (0L until 500L).toSeq)
    // round-robin shards balance exactly
    val byShard = out.groupBy(_.getLong(3)).view.mapValues(_.length)
    assert(byShard.values.toSet == Set(500 / 16, 500 / 16 + 1))
  }
}
