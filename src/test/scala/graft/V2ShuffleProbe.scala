package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Scratch: print q_curate_pipeline_v2's emit-path shuffle keys twice in
  * one JVM (AQE reuse can differ between first and warmed runs). */
object V2ShuffleProbe extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("v2-shuffle-probe").getOrCreate()
    for (round <- 1 to 2) {
      val df = SparkEntry.queries("q_curate_pipeline_v2")(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan
      val all = collectWithSubqueries(p) { case e: ShuffleExchangeExec => e }
      val ub = collectWithSubqueries(p) { case b: BroadcastExchangeExec => b }
        .flatMap(b => collect(b.child) { case e: ShuffleExchangeExec => e })
      val emit = all.filterNot(e => ub.exists(_ eq e))
      println(s"[v2sp] round $round emit=${emit.size} all=${all.size}")
      emit.foreach(e => println(s"[v2sp]   ${e.outputPartitioning}"))
    }
    spark.stop()
  }
}
