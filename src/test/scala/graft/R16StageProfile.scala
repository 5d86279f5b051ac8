package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one catalog query: registers a listener and
  * prints every completed stage's duration + call site, so the dominant
  * operator inside a multi-stage plan is measured, not guessed.
  * `Test/runMain graft.R16StageProfile q_curate_pipeline_v3`. */
object R16StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("r16-stage-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.registerAll(spark, sfDir)
    graft.queries.tableNames.foreach(t => spark.table(t).limit(1).count())
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val ms = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        if (ms >= 100)
          println(f"[stage] ${ms / 1000.0}%8.3f s  tasks=${si.numTasks}%-4d " +
            s"${si.name.take(120)}")
      }
    }
    for (name <- args) {
      // one untimed warmup (codegen, memo fills), then the profiled run
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      println(s"########## $name ##########")
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[total] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
