package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q_sim_clusters pipeline — times the pair-join
  * input and the connected-components loop separately, twice each, in one
  * warmed JVM. Not a ScalaTest; run with `Test/runMain graft.CCPerfProbe`.
  */
object CCPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("cc-probe").getOrCreate()
    import graft.queries.tbl

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (round <- 1 to 2) {
      val pairs = graft.ops.Similarity.thresholdPairs(
        tbl(spark, sfDir, "embeddings"),
        "label", "vec_id", "embedding", threshold = 0.35, chunks = 8,
        (x, y) => org.apache.spark.sql.graft.CosineSimilarity.cosine_sim(x, y))
      val edges = time(s"r$round thresholdPairs")(
        pairs.select(col("id_a"), col("id_b")).persist())
      println(s"[probe] r$round edges=${edges.count()}")
      time(s"r$round ccLoop")(
        graft.ops.Components.connectedComponents(edges, "id_a", "id_b").count())
      edges.unpersist()
    }
    spark.stop()
  }
}
