package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Scratch: print the CBO-on/off optimized join leaf orders and whether
  * the AQE skew join flag appears at sf0.001. */
object CboProbe extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("cbo-probe").getOrCreate()
    val dir = "/root/testdata/sf0.001"
    def leafOrder(cbo: Boolean): Seq[String] =
      graft.queries.Relational.cboJoinOrderQuery(spark, dir, cbo)
        .queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString.replaceAll("(?s).*graft_cbo_[0-9a-f]+_([a-z]+).*", "$1"))
    println("[cbo] off: " + leafOrder(false).mkString(","))
    println("[cbo] on:  " + leafOrder(true).mkString(","))
    val df = SparkEntry.queries("q_join_skew_aqe")(spark, dir)
    df.collect()
    val smj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case j: SortMergeJoinExec => j
    }
    println("[cbo] smj: " + smj.map(j => s"skew=${j.isSkewJoin}").mkString(","))
    spark.stop()
  }
}
