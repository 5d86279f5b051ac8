package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: run named catalog queries N times each in one warmed
  * JVM, printing per-iteration wall times. Separates first-run costs
  * (plan analysis, codegen, file-index) from steady-state execution.
  * Usage: `Test/runMain graft.QueryProbe q_text_tfidf q_sim_clusters`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001), SPARK_GRAFT_REPS (default 3).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("query-probe").getOrCreate()
    for (name <- args; q = SparkEntry.queries(name); i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"[probe] $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
