package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Measurement probe behind SCALE.md's threshold-pairs super-linearity
// analysis (`sbt "Test/runMain graft.PairsScaleProbe [sfDir]"`): the
// within-label exact pair join is O(Σ n_label²) BY SEMANTICS, so the
// claim to validate is not "time grows linearly" (it can't) but
// "per-pair throughput stays flat and no straggler forms as pair volume
// grows quadratically" — i.e. the chunk-salted fan-out turns growth into
// more balanced tasks. Replicas reuse labels (per-label density grows
// with the factor — the quadratic stressor) with offset ids; planted
// cross-replica duplicates only inflate the OUTPUT rows, making the
// probe conservative.
object PairsScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graft.CosineSimilarity.cosine_sim
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$d/embeddings.parquet")
    for (n <- Seq(1, 3, 10, 30)) {
      val df = (0 until n).map(i =>
          base.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _).cache()
      val rows = df.count()
      val cand = df.groupBy("label").count().collect()
        .map { r => val c = r.getLong(1); c * (c - 1) / 2 }.sum
      val t0 = System.nanoTime()
      val out = graft.ops.Similarity.thresholdPairs(df, "label", "vec_id",
        "embedding", threshold = 0.35, chunks = 8,
        (a, b) => cosine_sim(a, b)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pairs] x$n%-3d rows=$rows%-7d cand=${cand / 1e6}%8.1fM out=$out%-9d " +
        f"time=$secs%7.2fs  throughput=${cand / secs / 1e6}%6.1f Mpairs/s")
      df.unpersist()
    }
    spark.stop()
  }
}
