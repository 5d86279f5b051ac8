package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job-level timeline for one catalog query: prints every job's span and
  * the DRIVER GAP before it (time since the previous job finished — the
  * window where only planning/AQE re-optimization can be running), so
  * driver-side cost between stages is measured, not guessed (§7.3).
  * `Test/runMain graft.R16JobGaps q_curate_pipeline_v2`. */
object R16JobGaps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("r16-job-gaps").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.registerAll(spark, sfDir)
    graft.queries.tableNames.foreach(t => spark.table(t).limit(1).count())
    @volatile var lastEnd = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit = {
        starts.put(ev.jobId, ev.time)
        val gap = if (lastEnd == 0) 0.0 else (ev.time - lastEnd) / 1000.0
        println(f"[job] #${ev.jobId}%-4d start gap=$gap%7.3f s stages=${ev.stageInfos.size}")
      }
      override def onJobEnd(ev: SparkListenerJobEnd): Unit = {
        lastEnd = ev.time
        val dur = Option(starts.get(ev.jobId))
          .map(s => (ev.time - s) / 1000.0).getOrElse(-1.0)
        println(f"[job] #${ev.jobId}%-4d end   dur=$dur%7.3f s")
      }
    }
    for (name <- args) {
      SparkEntry.queries(name)(spark, sfDir).count() // warmup
      spark.catalog.clearCache()
      println(s"########## $name ##########")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tc = (System.nanoTime() - t0) / 1e9
      println(f"[construct] $tc%.3f s")
      lastEnd = System.currentTimeMillis()
      spark.sparkContext.addSparkListener(listener)
      val t1 = System.nanoTime()
      df.count()
      println(f"[total] $name construct=$tc%.3f s exec=${(System.nanoTime() - t1) / 1e9}%.3f s")
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
