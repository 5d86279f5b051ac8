package graft

import org.apache.spark.sql.SparkSession

/** Splits one catalog query's wall time into construct (the queries-map
  * closure call, incl. eager memo fits on first touch), plan (analyze +
  * optimize + physical planning via executedPlan), and execute (count),
  * so driver-side planning cost is measured, not guessed (guide §7.3).
  * `Test/runMain graft.R16PlanTime q_curate_pipeline_v3 ...`. */
object R16PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("r16-plan-time").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.registerAll(spark, sfDir)
    graft.queries.tableNames.foreach(t => spark.table(t).limit(1).count())
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (name <- args) {
      // warmup: memo fills + codegen, untimed
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      val (df, tc) = t(SparkEntry.queries(name)(spark, sfDir))
      val (_, tp) = t(df.queryExecution.executedPlan)
      val (_, te) = t(df.count())
      println(f"[plantime] $name%-28s construct=$tc%7.3f s  plan=$tp%7.3f s  exec=$te%7.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
