package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for SCALE.md: the JOINT (ks, rerank) operating
  * surface of the IVF-PQ tier — the round-14 verdict's open question.
  * The rerank dial was retuned to the density-scaled `adcRerank` law in
  * round 13 with ks frozen at 16; this sweep varies BOTH so the chosen
  * operating point is a measured point on a surface, not a line.
  * Usage: `Test/runMain graft.PqJointSweepProbe [sfDir]`
  *
  * Reports, per (ks, rerank): recall@3 against brute force, the
  * one-time fit wall (codebook k-means grows with ks), and the
  * steady-state probe wall (ADC table build per query grows with ks;
  * the shortlist/exact-rerank tail grows with rerank).
  */
object PqJointSweepProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("pq-joint-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.queries.tbl(spark, dir, "embeddings").cache()
    val n = e.count()
    val queries = e.filter(col("vec_id") % 50 === 0).cache()
    println(s"[pqsweep] corpus $dir: $n vectors, ${queries.count()} queries")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, e, 3))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val adc = Similarity.adcRerank(n, nLists = 8, nProbe = 2)
    println(s"[pqsweep] adcRerank = $adc; exact pairs = ${exact.size}")
    println("[pqsweep] ks | rerank | recall@3 | fit_s | probe_s")
    for (ks <- Seq(16, 64, 256)) {
      val ixDir = graft.io.TempDirs
        .createDeletedOnExit(s"graft_pqsweep_$ks").getAbsolutePath
      val ((index, cb), fitS) = timed(
        Similarity.fitIvfPq(e, nLists = 8, m = 8, ks = ks, dim = 64, ixDir))
      for (rr <- Seq(32, adc, 2 * adc)) {
        def once() = Similarity
          .probeIvfPq(e, queries, 3, index, cb, nProbe = 2, rerank = rr)
        once().count() // codegen warmup per config
        val (got, probeS) = timed(pairs(once()))
        val rec = (got & exact).size.toDouble / exact.size
        println(f"[pqsweep] $ks%3d | $rr%6d | $rec%.4f | $fitS%6.1f | $probeS%6.2f")
      }
    }
    spark.stop()
  }
}
