package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector: print each named catalog query's EXECUTED
  * physical plan (post-AQE) — the artifact PlanContractSpec pins. Usage:
  * `Test/runMain graft.PlanDump q_agg_corr_matrix ...`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
