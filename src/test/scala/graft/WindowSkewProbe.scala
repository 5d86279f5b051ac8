package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Window-partition skew measurement: the batch complement of the
  * streaming hot-state-key probe. `q_window_range_frame` and
  * `q_events_attribution` partition their windows by `user_id`; a viral
  * user (zipf corpus: ~25% of events on 4 hot keys) lands that user's
  * whole event history in ONE sort-and-scan task — the window-operator
  * skew case AQE cannot split (a RANGE frame needs its partition whole;
  * there is no window analogue of the skew-join partial split).
  *
  *   sbt "Test/runMain graft.WindowSkewProbe /tmp/graft_sf1_skew /tmp/graft_sf1"
  *
  * What bounds the damage, and what this probe measures rather than
  * argues: the frame STATE is time-bounded (1 h / 7 d of one user's
  * events), so memory stays flat — the cost is the hot task's sort +
  * linear frame walk, i.e. wall-clock elongation, not OOM. The probe
  * reports per-query wall on skewed vs uniform corpora plus the hot
  * partition's share of rows, so SCALE.md can state the measured
  * elongation and the regime where pre-bucketing by (user, time-bucket)
  * with boundary overlap becomes worth its complexity.
  */
object WindowSkewProbe {
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
    def time(name: String)(f: => Long): Long = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val n = f
      println(f"[wskew] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
      n
    }
    def profile(dir: String): Unit = {
      val ev = graft.queries.tbl(spark, dir, "events")
      val total = ev.count()
      val top = ev.groupBy("user_id").count().orderBy(desc("count"))
        .limit(4).collect()
      val topShare = top.map(_.getLong(1)).sum * 100.0 / total
      println(f"[wskew] $dir: $total rows, top-4 users ${topShare}%.1f%% " +
        s"(hot=${top.head.getLong(0)} n=${top.head.getLong(1)})")
    }
    val dirs = uniformDir.toSeq.map(("uniform", _)) :+ (("zipf", skewDir))
    dirs.foreach { case (_, d) => profile(d) }
    for ((tag, d) <- dirs) {
      time(s"q_window_range_frame  [$tag]")(
        SparkEntry.queries("q_window_range_frame")(spark, d).count())
      time(s"q_events_attribution  [$tag]")(
        SparkEntry.queries("q_events_attribution")(spark, d).count())
    }
    spark.stop()
  }
}
