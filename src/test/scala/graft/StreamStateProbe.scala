package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-state probe for the two axes the batch ladder cannot grow:
  * state-store BACKEND at decade scale and state-key SKEW.
  *
  *   sbt "Test/runMain graft.StreamStateProbe /tmp/graft_sf1 /tmp/graft_sf10"
  *   SPARK_GRAFT_STATE_PROVIDER=rocksdb sbt "Test/runMain graft.StreamStateProbe ..."
  *   sbt "runMain graft.ScaleUpMain /root/testdata/sf0.1 /tmp/graft_sf1_skew 10 zipf"
  *   sbt "Test/runMain graft.StreamStateProbe /tmp/graft_sf1 /tmp/graft_sf1_skew"
  *
  * For each dir: reports the session-state key distribution (events per
  * `user_id` — the state key of `q_stream_sessions`/`q_stream_stateful`;
  * a zipf corpus concentrates per-key state exactly where a viral user
  * would), then times the two state-heavy catalog streams twice each
  * (rep 1 absorbs plan/codegen warmup; rep 2 is the steady number).
  * The provider comes from the catalog's own deployment seam
  * (`StreamOps.DefaultStateProvider`), so a RocksDB run exercises the
  * exact code path the knob ships.
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamStateProbe <sfDir> [moreDirs...]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val provider = sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "memory")

    for (dir <- args) {
      val ev = graft.queries.tbl(spark, dir, "events")
      val total = ev.count()
      val top = ev.groupBy("user_id").count()
        .orderBy(desc("count"), asc("user_id")).limit(5).collect()
      val topStr = top.map(r =>
        f"${r.get(0)}=${r.getLong(1) * 100.0 / total}%.1f%%").mkString(" ")
      println(s"[stream-state] $dir provider=$provider events=$total " +
        s"top5-user-share: $topStr")
      for (q <- Seq("q_stream_sessions", "q_stream_stateful"); rep <- 1 to 2) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        println(f"[stream-state] $dir $q%-20s provider=$provider rep$rep " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
      }
      // per-key OUTPUT state mass of the session query: sessions + events
      // absorbed by the hottest user (state the store must hold for them)
      val sess = spark.table("stream_sessions")
      val hot = sess.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .orderBy(desc("n_events"), asc("user_id")).limit(3).collect()
      println(s"[stream-state] $dir hottest session keys: " +
        hot.map(r => s"user=${r.get(0)} sessions=${r.get(1)} events=${r.get(2)}")
          .mkString("; "))
    }
    spark.stop()
  }
}
