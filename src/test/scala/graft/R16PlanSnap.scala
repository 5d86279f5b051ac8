package graft

import org.apache.spark.sql.SparkSession

/** Captures `.explain("formatted")` for named catalog queries into
  * $PLAN_OUT_DIR/<query>_$PLAN_SUFFIX.txt (the judge-checkable plan
  * artifacts for the optimization rounds). The query is executed first
  * so the dump reflects the FINAL (post-AQE) plan.
  * `Test/runMain graft.R16PlanSnap q_a q_b ...` */
object R16PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val outDir = sys.env.getOrElse("PLAN_OUT_DIR", "plans/r16")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "after")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // execute so AQE finalizes + codegen ids settle
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        formatted.getBytes("UTF-8"))
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
