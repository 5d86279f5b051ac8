package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Dedup

/** Scratch stage-bisection for q_curate_pipeline_v2: times each prefix of
  * the chain so the dominant stage is measured, not guessed.
  * `Test/runMain graft.V2StageProbe`; SPARK_GRAFT_SF_DIR selects the dir. */
object V2StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("v2-stage-probe").getOrCreate()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[v2probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val d = graft.queries.tbl(spark, sfDir, "documents")
    val day = d.filter(col("doc_id") % 5 === 0)
    val sub = when(col("doc_id") % 7 === 0, lit("cdn."))
      .when(col("doc_id") % 7 === 1, lit("www.")).otherwise(lit(""))
    val hosted = day.withColumn("registered_domain",
      array_join(slice(split(
        concat(sub, col("source"), lit(".example.com")), "\\."), -3, 3), "."))
    val bl = spark.createDataFrame(Seq(Tuple1("src15.example.com"),
      Tuple1("phish.example.net"))).toDF("blocked_domain")
    val unblocked = hosted.join(broadcast(bl),
      hosted("registered_domain") === bl("blocked_domain"), "left_anti")
    time("unblocked")(unblocked.count())
    // url canon — mimic withCanonicalUrl via the catalog query is not
    // accessible; approximate with q_dedup_url's cost instead
    time("q_dedup_url")(SparkEntry.queries("q_dedup_url")(spark, sfDir).count())
    val sigs = Dedup.minHashSignatures(day, "doc_id", "text")
    val cands = Dedup.lshCandidatePairs(sigs).persist()
    time("cands")(cands.count())
    time("verify")(Dedup.verifyCandidates(day, "doc_id", "text",
      cands, "id_a", "id_b").count())
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val sketchBytes = time("fitSketch")(graft.ops.BloomDedup.fitSketch(
      corpus, "doc_id", "text"))
    val bc = spark.sparkContext.broadcast(sketchBytes)
    time("seenBlocks")(graft.ops.BloomDedup.seenBlocks(
      corpus, day, "doc_id", "text", bc).count())
    time("seenBlocks2")(graft.ops.BloomDedup.seenBlocks(
      corpus, day, "doc_id", "text", bc).count())
    time("funnel_v1_proxy")(SparkEntry.queries("q_filter_funnel")(spark, sfDir).count())
    time("full_v1")(SparkEntry.queries("q_curate_pipeline")(spark, sfDir).count())
    time("full_v2")(SparkEntry.queries("q_curate_pipeline_v2")(spark, sfDir).count())
    time("full_v2b")(SparkEntry.queries("q_curate_pipeline_v2")(spark, sfDir).count())
    spark.stop()
  }
}
