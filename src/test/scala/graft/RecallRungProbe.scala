package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: measure ANN recall@3 for the catalog configurations (LSH
  * multi-probe, IVF nProbe=2, IVF-PQ rerank-32) on a scaled corpus.
  * Usage: run_main.sh graft.RecallRungProbe /tmp/graft_sf1 */
object RecallRungProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .appName("recall-rung-probe").getOrCreate()
    val e = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    println(s"[rung] corpus rows = ${e.count()}")
    val queries = e.filter(col("vec_id") < 50).cache()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, e, 3))
    println(s"[rung] exact pairs = ${exact.size}")
    def rec(name: String, got: Set[(Long, Long)]): Unit =
      println(f"[rung] $name recall@3 = ${(got & exact).size.toDouble / exact.size}%.4f")
    rec("lsh_multiprobe", pairs(Similarity.lshTopK(e, queries, dim = 64, k = 3,
      bits = 4, hammingRadius = 1)))
    val ivfDir = graft.io.TempDirs.createDeletedOnExit("graft_rung_ivf_").getAbsolutePath
    val ix = Similarity.fitIvf(e, nLists = 8, ivfDir)
    rec("ivf_nprobe2", pairs(Similarity.probeIvf(spark, ix, queries, k = 3, nProbe = 2)))
    val pqDir = graft.io.TempDirs.createDeletedOnExit("graft_rung_ivfpq_").getAbsolutePath
    val (pix, cb) = Similarity.fitIvfPq(e, nLists = 8, m = 8, ks = 16, dim = 64, pqDir)
    for (r <- Seq(32, 128, 512, 2048,
        Similarity.adcRerank(e.count(), nLists = 8, nProbe = 2)))
      rec(s"ivfpq_rerank$r", pairs(Similarity.probeIvfPq(e, queries, 3, pix, cb,
        nProbe = 2, rerank = r)))

    spark.stop()
  }
}
