package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Measurement probe behind SCALING.md §9's contamination DF-cap numbers
// (`sbt "Test/runMain graft.ContamCapProbe [sfDir]"`): join-input volume
// with/without the hot-shingle cap, on a derived corpus with injected
// boilerplate (the real corpus's max DF is 4 — no natural hot grams to
// measure). Mirrors Contamination.sweep's phase-1 index shape; kept so
// the published numbers stay reproducible.
object ContamCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graft.TokenShingleHashes.token_shingle_hashes
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // every doc gets the same 12-token license-header boilerplate prefix —
    // 8 hot 5-grams with DF = |corpus|, the classic contamination-sweep trap
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("text", concat(
        lit("this dataset is released under the creative commons attribution license terms "),
        col("text")))
    val n = docs.count()
    val grams = docs.select(col("doc_id"), explode(token_shingle_hashes(col("text"), 5)).as("h"))
    val idx = grams.groupBy("h").agg(count(lit(1)).as("df"),
      sum(when(col("doc_id") % 100 === 0, 1).otherwise(0)).as("n_eval"))
      .where(col("n_eval") > 0)
    def vol(cap: Long): Long = grams.where(col("doc_id") % 100 =!= 0)
      .join(idx.where(col("df") <= cap).select("h"), "h").count()
    val noCap = vol(Long.MaxValue)
    val cap1k = vol(1000L)
    println(s"[probe] docs=$n join_rows_nocap=$noCap join_rows_cap1000=$cap1k ratio=${noCap.toDouble/math.max(cap1k,1)}")
    // pairs produced either way (boilerplate inflates overlap, not pair identity here)
    spark.stop()
  }
}
