package graft

import org.apache.spark.sql.SparkSession

/** Runs named catalog queries N times each (bench-style: clearCache +
  * count per rep) printing every rep's wall time plus GC time delta, to
  * chase within-session variance. `Test/runMain graft.R16Repeat 5 q_a`. */
object R16Repeat {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("r16-repeat").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.registerAll(spark, sfDir)
    graft.queries.tableNames.foreach(t => spark.table(t).limit(1).count())
    val reps = args.head.toInt
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    for (name <- args.tail) {
      SparkEntry.queries(name)(spark, sfDir).count() // warmup
      for (rep <- 1 to reps) {
        spark.catalog.clearCache()
        val g0 = gcMillis
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[rep] $name rep=$rep wall=$dt%7.3f s gc=${(gcMillis - g0) / 1000.0}%6.3f s")
      }
    }
    spark.stop()
  }
}
