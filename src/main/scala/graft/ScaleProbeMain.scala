package graft

import graft.ops.{Dedup, IntervalExpand}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Throwaway scaling probe: times the narrow flagship ops at 1x and 10x
// input to confirm linear behavior. Not part of the driver contract.
object ScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    def x10(df: DataFrame, idCol: String): DataFrame =
      (0 until 10).map(i => df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ unionByName _)

    val readings = graft.queries.Flagship.syntheticReadings(spark, dir).cache()
    readings.count()
    time("interval_expand 1x")(IntervalExpand.faithful(readings, sort = false).count())
    val readings10 = x10(readings, "event_id").cache()
    readings10.count()
    time("interval_expand 10x")(IntervalExpand.faithful(readings10, sort = false).count())

    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    docs.count()
    time("minhash signatures 1x")(Dedup.minHashSignatures(docs, "doc_id", "text").count())
    val docs10 = x10(docs, "doc_id").cache()
    docs10.count()
    time("minhash signatures 10x")(Dedup.minHashSignatures(docs10, "doc_id", "text").count())
    time("minhash+lsh pairs 10x")(
      Dedup.lshCandidatePairs(Dedup.minHashSignatures(docs10, "doc_id", "text")).count())

    // LSH candidate growth vs corpus size, on INDEPENDENT corpora (sf0.01
    // vs sf0.1 — real 10x, no synthetic duplication that would plant
    // near-dups): near-linear candidates/doc is the property that keeps
    // the verify join from going quadratic at 100 TB.
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val dd = spark.read.parquet(s"$d/documents.parquet")
      val n = dd.count()
      val cands = Dedup.lshCandidatePairs(
        Dedup.minHashSignatures(dd, "doc_id", "text")).count()
      println(f"[scale] lsh-candidates $d%-28s docs=$n%6d candidates=$cands%8d per-doc=${cands.toDouble / n}%8.4f")
    }

    // Heap-pruned top-k: 1x vs 10x of the low-cardinality worst case. The
    // interesting number is the survivor count (k x partitions x groups,
    // NOT data-proportional) — the window input stays constant-sized as
    // the table grows.
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .cache()
    li.count()
    time("topk rank trio 1x")(graft.ops.TopK.rankTrio(li, Seq("l_returnflag"),
      Seq("l_extendedprice" -> false, "l_orderkey" -> true,
        "l_linenumber" -> true), 10).count())
    val li10 = x10(li, "l_orderkey").cache()
    li10.count()
    time("topk rank trio 10x")(graft.ops.TopK.rankTrio(li10, Seq("l_returnflag"),
      Seq("l_extendedprice" -> false, "l_orderkey" -> true,
        "l_linenumber" -> true), 10).count())

    // Binned range join: candidate-to-match ratio — binning is effective
    // when candidates stay within a small constant of true matches.
    val week = 7L * 86400
    val iv = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
        (col("o_orderdate") + make_dt_interval(days = lit(7))).as("w_end"))
    val pts = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_shipdate")
    val matches = graft.ops.RangeJoin.pointInInterval(
      pts, "l_shipdate", iv, "w_start", "w_end", binSeconds = week).count()
    val candidates = graft.ops.RangeJoin.candidates(
      pts, "l_shipdate", iv, "w_start", "w_end", binSeconds = week).count()
    println(f"[scale] range-join                    matches=$matches%8d candidates=$candidates%8d ratio=${candidates.toDouble / matches}%6.2f")
    spark.stop()
  }
}
