package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Build-vs-probe split for the IVF-PQ index on a scale-ladder corpus:
  *
  *   sbt "runMain graft.ScaleUpMain /root/testdata/sf0.1 /tmp/graft_sf10 100"
  *   sbt "Test/runMain graft.IvfPqProbe /tmp/graft_sf10"
  *
  * The scale-ladder bench charges `q_sim_ivfpq_ann`'s one-time index
  * build to the query (the per-query clearCache + fresh-JVM sweep defeats
  * the catalog entry's per-corpus memo), so its SCALE.md row conflates a
  * layout job with the steady-state probe a production ANN service
  * actually serves. This probe times the two phases separately:
  *
  *   - build  — `fitIvfPq` end to end: coarse k-means, PQ codebook fit,
  *     and the coded inverted-list layout write. Per CORPUS, not per
  *     query batch; amortizes over every probe that follows.
  *   - probe  — `probeIvfPq` against the already-built index, median of 3
  *     (the memoized path every catalog invocation after the first takes).
  *
  * Same parameters as the catalog entry (nLists=8, m=8, ks=64 — the
  * round-16 joint-sweep operating point — nProbe=2, density-scaled
  * adcRerank shortlist, queries = vec_id % 50 == 0).
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.queries.tbl(spark, dir, "embeddings")
    val n = e.count() // warm footers; corpus size for the report
    println(s"[ivfpq] corpus $dir: $n vectors")

    def timed(f: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val indexDir =
      graft.io.TempDirs.createDeletedOnExit("graft_ivfpq_probe_").getAbsolutePath
    var built: (Similarity.IvfIndex, graft.ops.ProductQuantizer.PqCodebook) = null
    val build = timed {
      built = Similarity.fitIvfPq(e, nLists = 8, m = 8, ks = 64, dim = 64, indexDir)
    }
    val (index, cb) = built
    val rr = Similarity.adcRerank(n, nLists = 8, nProbe = 2)

    def probeOnce(): Unit =
      Similarity.probeIvfPq(e, e.filter(col("vec_id") % 50 === 0), k = 3,
        index, cb, nProbe = 2, rerank = rr).count()
    probeOnce() // untimed: probe-plan codegen warmup
    val probes = List.fill(3)(timed(probeOnce())).sorted
    println(f"[ivfpq] build ${build}%.2f s; steady-state probe median " +
      f"${probes(1)}%.2f s (min ${probes.head}%.2f, max ${probes.last}%.2f)")
    spark.stop()
  }
}
