package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.PartialReducerPartitionSpec
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Skew-rung measurement over a zipf corpus written by
  * `ScaleUpMain <src> <dst> <factor> zipf [alphaPct [hotK]]`:
  *
  *   sbt "runMain graft.ScaleUpMain /root/testdata/sf0.1 /tmp/graft_sf1_skew 10 zipf"
  *   sbt "Test/runMain graft.SkewProbe /tmp/graft_sf1_skew /tmp/graft_sf1"
  *
  * Measures the skewed lineitem⋈orders join three ways — AQE skew-split
  * ON, skew-split OFF (the straggler), and manually salted (skew-split
  * OFF) — verifying all three agree row-for-row, and reports whether the
  * AQE run actually split the hot partition (PartialReducerPartitionSpec
  * count). Then times the skew-sensitive catalog queries on the skewed
  * dir (vs the uniform dir if given) so SCALE.md's skew section is
  * measured, not argued. Broadcast is disabled for the probe joins: at
  * 100 TB neither side of a fact-fact join broadcasts, and a local
  * broadcast would dodge the very shuffle being measured.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val skewDir = args.headOption.getOrElse("/tmp/graft_sf1_skew")
    val uniformDir = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $name%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def joinAgg(dir: String): DataFrame = {
      val li = graft.queries.tbl(spark, dir, "lineitem")
      val o = graft.queries.tbl(spark, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderstatus")
    }
    def saltedAgg(dir: String): DataFrame =
      SparkEntry.queries("q_join_skew_salted")(spark, dir)
    def skewSplits(df: DataFrame): Int = {
      // QueryStageExec (incl. the ResultQueryStage wrapping the whole
      // final plan in Spark 4.1) is a LEAF node: plain collect never
      // descends into stages, so recurse through .plan explicitly
      def reads(p: org.apache.spark.sql.execution.SparkPlan): Seq[AQEShuffleReadExec] =
        p.collect {
          case a: AdaptiveSparkPlanExec => reads(a.executedPlan)
          case q: QueryStageExec => reads(q.plan)
          case r: AQEShuffleReadExec => Seq(r)
        }.flatten
      reads(df.queryExecution.executedPlan)
        .flatMap(_.partitionSpecs)
        .count(_.isInstanceOf[PartialReducerPartitionSpec])
    }

    // top-key share: how hot did the reroute actually make the corpus?
    val li = graft.queries.tbl(spark, skewDir, "lineitem")
    val total = li.count()
    val top = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(4).collect()
    println(s"[skew] corpus: $total lineitem rows; top-4 l_orderkey " +
      s"carry ${top.map(_.getLong(1)).sum} " +
      f"(${top.map(_.getLong(1)).sum * 100.0 / total}%.1f%%)")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // untimed warmup: codegen + parquet footers for both plan shapes, so
    // the first timed config doesn't absorb one-time session costs
    joinAgg(skewDir).count(); saltedAgg(skewDir).count()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqeRows = time("join unsalted, AQE defaults") {
      val df = joinAgg(skewDir); val r = df.collect().toSeq
      println(s"[skew]   -> PartialReducerPartitionSpec slices: ${skewSplits(df)}" +
        " (production 256MB threshold; local hot partition is ~MBs -> no" +
        " split expected, and none needed at this absolute size)")
      r
    }
    // Production regime reproduced by ratio: a split needs the hot
    // partition over BOTH the absolute threshold (256 MB default; local
    // hot partitions are ~10 MB) and factor x median (default 5x; the
    // 4-hot-key reroute lands ~3.3x median per partition, each hot key
    // hashing to its own partition). A 100 TB viral key clears both by
    // orders of magnitude; scale both knobs to this corpus's sizes to
    // reproduce that regime without pretending the local data is 100 TB.
    // (sizes here are MapOutputStatistics COMPRESSED shuffle bytes —
    // lz4 shrinks the narrow long/double projection ~4x, so the ~14 MB
    // in-memory hot partition is ~3 MB on the wire)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
    val scaledRows = time("join unsalted, AQE thresholds ratio-scaled") {
      val df = joinAgg(skewDir); val r = df.collect().toSeq
      val n = skewSplits(df)
      println(s"[skew]   -> PartialReducerPartitionSpec slices: $n")
      require(n > 0, "AQE skew-split must engage once the hot partition " +
        "exceeds the (ratio-scaled) threshold")
      r
    }
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val offRows = time("join unsalted, AQE skew-split OFF")(
      joinAgg(skewDir).collect().toSeq)
    val saltRows = time("join salted (8 salts), skew-split OFF")(
      saltedAgg(skewDir).collect().toSeq)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    require(aqeRows == offRows && offRows == saltRows && aqeRows == scaledRows,
      "skew mitigations disagree on the join result")
    println("[skew] all four strategies agree row-for-row")

    for (q <- Seq("q_topk_per_group", "q_skew_profile", "q_sim_threshold_pairs")) {
      time(s"$q on zipf corpus")(
        SparkEntry.queries(q)(spark, skewDir).count())
      uniformDir.foreach { u =>
        time(s"$q on uniform corpus")(
          SparkEntry.queries(q)(spark, u).count())
      }
    }

    // Pathological rung (one viral key, ~45% of the fact table): the
    // regime where the straggler actually dominates wall-clock and the
    // mitigations must WIN, not just not-lose. args(2) points at a
    // `zipf 50 1` corpus; skipped when absent.
    if (args.length > 2) {
      val patDir = args(2)
      val li1 = graft.queries.tbl(spark, patDir, "lineitem")
      val t1 = li1.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy(desc("n")).limit(1).head()
      println(s"[skew] pathological corpus: hot l_orderkey ${t1.getLong(0)} " +
        f"carries ${t1.getLong(1)} of ${li1.count()} rows")
      joinAgg(patDir).count() // warm
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val u = time("pathological: unsalted, skew-split OFF")(
        joinAgg(patDir).collect().toSeq)
      val s = time("pathological: salted (8), skew-split OFF")(
        saltedAgg(patDir).collect().toSeq)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
      val a = time("pathological: AQE split, scaled thresholds") {
        val df = joinAgg(patDir); val r = df.collect().toSeq
        println(s"[skew]   -> PartialReducerPartitionSpec slices: ${skewSplits(df)}")
        r
      }
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      require(u == s && s == a, "pathological-rung strategies disagree")
      println("[skew] pathological rung: all three agree row-for-row")
    }
    spark.stop()
  }
}
