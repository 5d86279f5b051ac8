package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function family: ranking, offsets (lag/lead), running frames.
  *
  * Determinism: every window ORDER BY ends in a unique key tiebreak
  * (orderkey/linenumber) so row_number / lag assignments are stable across
  * engines and partition layouts.
  */
object Windows {

  val defs: Map[String, Q] = Map(
    // Rank trio per return flag — computed with the heap-pruned top-k
    // (ops.TopK) so 3 flag values never become 3 straggler sort tasks.
    "q_window_rank" -> ((s, dir) => {
      graft.ops.TopK.rankTrio(
          tbl(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_orderkey"),
              col("l_linenumber"), col("l_extendedprice")),
          Seq("l_returnflag"),
          Seq("l_extendedprice" -> false, "l_orderkey" -> true,
            "l_linenumber" -> true),
          k = 10)
        .orderBy("l_returnflag", "rn")
    }),
    "q_window_lag_lead" -> ((s, dir) => {
      val byDate = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(byDate), 2))
        .withColumn("next_price", round(lead(col("o_totalprice"), 1).over(byDate), 2))
        .drop("o_orderdate")
        .orderBy("o_custkey", "o_orderkey")
    }),
    "q_window_running" -> ((s, dir) => {
      val frame = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("running_total", round(sum(col("o_totalprice")).over(frame), 2))
        .withColumn("running_n", count(lit(1)).over(frame))
        .drop("o_orderdate")
        .orderBy("o_custkey", "o_orderkey")
    }),
    "q_window_moving_avg" -> ((s, dir) => {
      val last3 = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, Window.currentRow)
      tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("mavg3", round(round(sum(col("o_totalprice")).over(last3), 2) / count(lit(1)).over(last3), 6))
        .drop("o_orderdate")
        .orderBy("o_custkey", "o_orderkey")
    }),
    // TIME-based RANGE frame — the physical-time complement of the
    // ROWS-counted moving average above: each event sees the trailing
    // REAL hour of its user's activity, however many rows that is
    // (bursts widen the frame, quiet periods shrink it — a row-count
    // frame cannot express either). Ordered on integer micros with
    // inclusive [-1h, now] bounds = DuckDB's RANGE INTERVAL 1 HOUR
    // PRECEDING; values are cents-quantized before summing so both
    // engines do exact long arithmetic. Evaluated via the CHUNKED range
    // frame (ops.RangeFrame): the window partitions by (user, hour-chunk)
    // with boundary-context duplication instead of by user alone, so a
    // viral user's history splits across span/1h parallel tasks rather
    // than one straggler sort — bit-identical to the plain window by the
    // frame's own time bound (RangeFrameSpec pins it on a zipf corpus),
    // same frame state bound (the hour's event count).
    "q_window_range_frame" -> ((s, dir) => {
      val hourUs = 3600L * 1000000L
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      graft.ops.RangeFrame.trailing(ev, "user_id", "t_us", hourUs, Seq(
          "n_last_hour" -> count(lit(1)),
          "cents_last_hour" -> sum(col("cents"))))
        .select(col("event_id"), col("user_id"),
          col("n_last_hour"), col("cents_last_hour"))
        .orderBy("event_id")
    }),
    // Marketing-attribution metrics per conversion: each purchase sees
    // its user's click activity over the trailing REAL 7 days —
    // first/last touch timestamps, click count, and recency — as
    // CONDITIONAL aggregates over one range frame (min/max/count of
    // `when(type = click)` ignore the other event types' nulls), with
    // the purchase filter applied AFTER the window so click rows shape
    // frames without surviving into the result. One user_id shuffle;
    // frame state bounded by a week of per-user events. No-click
    // purchases keep NULL touches (div propagates), exactly as the
    // oracle's CASE/QUALIFY replay does.
    // Chunked like q_window_range_frame (ops.RangeFrame, 7-day chunks):
    // the conditional aggregates are frame-local, so the same
    // boundary-context evaluation applies unchanged.
    "q_events_attribution" -> ((s, dir) => {
      val weekUs = 7L * 24 * 3600 * 1000000L
      val isClick = col("event_type") === "click"
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t_us"))
      graft.ops.RangeFrame.trailing(ev, "user_id", "t_us", weekUs, Seq(
          "n_clicks_7d" -> count(when(isClick, lit(1))),
          "first_click_us" -> min(when(isClick, col("t_us"))),
          "last_click_us" -> max(when(isClick, col("t_us")))))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("n_clicks_7d"),
          col("first_click_us"), col("last_click_us"),
          expr("(t_us - last_click_us) div 1000000").as("secs_since_click"))
        .orderBy("event_id")
    }),
    // Distribution functions: relative rank and cumulative share of the
    // partition — one window shuffle for both.
    "q_window_distribution" -> ((s, dir) => {
      val byBal = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      tbl(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
        // round6, not round(x, 6): cume_dist = k/n hits exact .5 decimal
        // boundaries at scale, where Spark/DuckDB round() disagree
        .withColumn("pct_rank", round6(percent_rank().over(byBal)))
        .withColumn("cume", round6(cume_dist().over(byBal)))
        .orderBy("c_nationkey", "c_custkey")
    }),
    // Windowed anomaly detection: z-score of each hourly event count
    // against its type's trailing 24 OBSERVED buckets (rows frame, not a
    // time frame — identical semantics on both engines and no gap-filling
    // dependency). The moment stats ride as EXACT integer window sums
    // (Σn, Σn², k) — never stddev_samp(), whose Welford-vs-sum-of-squares
    // float path differs between engines — and the z-score is one fixed
    // association of double ops over those exact longs, micro-quantized.
    // One window shuffle on event_type after a bucket-cardinality
    // pre-aggregation: the corpus-scale event stream collapses to
    // types×hours rows BEFORE the window.
    "q_window_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-24, -1)
      tbl(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
        .withColumn("s", sum("n").over(w))
        .withColumn("k", count("n").over(w))
        .withColumn("q", sum(col("n") * col("n")).over(w))
        .filter(col("k") === 24)
        .withColumn("mean", col("s").cast("double") / col("k").cast("double"))
        .withColumn("vr",
          col("q").cast("double") / col("k").cast("double")
            - col("mean") * col("mean"))
        .filter(col("vr") > 0)
        .select(col("event_type"), unix_micros(col("h")).as("hour_us"),
          col("n"),
          floor((col("n").cast("double") - col("mean")) / sqrt(col("vr"))
            * 1000000.0).cast("long").as("z_micro"))
        .orderBy("event_type", "hour_us")
    }),
    // Exponentially-weighted trailing average with an EXACT dyadic
    // kernel: weights 2^7..2^0 over the last 8 orders (most recent
    // heaviest), normalized by the weight mass actually PRESENT (short
    // prefixes at partition start re-normalize instead of decaying
    // toward a phantom zero history). A float EWMA recurrence is
    // summation-order-dependent and engine-divergent by construction;
    // bounding the horizon and using power-of-two weights makes every
    // term an exact long, so both engines compute identical integers —
    // the same exactness stance as the OLS trend and TWA queries.
    // Evaluated as 8 explicit lag() columns over ONE window (codegen'd,
    // no collect_list frame whose element order is not contractual);
    // one o_custkey shuffle.
    "q_window_ewma" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val base = tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val terms = (0 until 8).map(i =>
        (lag(col("cents"), i).over(w), 1L << (7 - i)))
      val num = terms.map { case (c, wt) =>
        when(c.isNotNull, c * lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
      val den = terms.map { case (c, wt) =>
        when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
      base.withColumn("__num", num).withColumn("__den", den)
        .select(col("o_custkey"), col("o_orderkey"), col("cents"),
          expr("__num * 1000 div __den").as("ewma_milli"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "q_window_ntile_share" -> ((s, dir) => {
      val byPrice = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val part = Window.partitionBy("o_orderpriority")
      tbl(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("quartile", ntile(4).over(byPrice))
        .withColumn("price_share",
          round(col("o_totalprice") / sum(col("o_totalprice")).over(part), 6))
        .orderBy("o_orderpriority", "o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_window_anomaly" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
                           count(*) AS n
                         FROM events GROUP BY 1, 2),
         win AS (SELECT event_type, h, n,
                   sum(n) OVER w AS s, count(n) OVER w AS k,
                   sum(n * n) OVER w AS q
                 FROM hourly
                 WINDOW w AS (PARTITION BY event_type ORDER BY h
                              ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         st AS (SELECT event_type, h, n,
                  CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS mean,
                  CAST(q AS DOUBLE) / CAST(k AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)) AS vr
                FROM win WHERE k = 24)
         SELECT event_type, epoch_us(h) AS hour_us, n,
           CAST(floor((CAST(n AS DOUBLE) - mean) / sqrt(vr) * 1000000.0)
             AS BIGINT) AS z_micro
         FROM st WHERE vr > 0 ORDER BY event_type, hour_us""",
    "q_window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn, rnk, drnk FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             CAST(row_number() OVER w AS INT) AS rn,
             CAST(rank() OVER w AS INT) AS rnk,
             CAST(dense_rank() OVER w AS INT) AS drnk
           FROM lineitem
           WINDOW w AS (PARTITION BY l_returnflag
                        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)) t
         WHERE rn <= 10 ORDER BY l_returnflag, rn""",
    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
         round(lead(o_totalprice, 1) OVER w, 2) AS next_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         round(sum(o_totalprice) OVER w, 2) AS running_total,
         count(*) OVER w AS running_n
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "q_window_moving_avg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         round(round(sum(o_totalprice) OVER w, 2) / count(*) OVER w, 6) AS mavg3
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    // RANGE frame on the raw timestamp order — DuckDB's interval frame
    // bound is the same inclusive [ts - 1h, ts] window as Spark's
    // [-3600000000, 0] micros range.
    "q_window_range_frame" ->
      """SELECT event_id, user_id,
         count(*) OVER w AS n_last_hour,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w
              AS BIGINT) AS cents_last_hour
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    // QUALIFY applies the purchase filter after the window, mirroring
    // Spark's filter-after-window; count/min/max of CASE ignore nulls
    // on both engines.
    "q_events_attribution" ->
      """SELECT event_id, user_id,
         count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_clicks_7d,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER w
           AS first_click_us,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER w
           AS last_click_us,
         (epoch_us(ts) -
          max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER w)
           // 1000000 AS secs_since_click
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
         QUALIFY event_type = 'purchase'
         ORDER BY event_id""",
    "q_window_distribution" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
         floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
         floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
         ORDER BY c_nationkey, c_custkey""",
    // The same 8 lag() terms, CASE-summed, `//` = Spark `div`.
    "q_window_ewma" -> {
      val terms = (0 until 8).map { i =>
        val wt = 1L << (7 - i)
        (s"CASE WHEN lag(cents, $i) OVER w IS NOT NULL THEN lag(cents, $i) OVER w * $wt ELSE 0 END",
         s"CASE WHEN lag(cents, $i) OVER w IS NOT NULL THEN $wt ELSE 0 END")
      }
      s"""WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         t AS (SELECT o_custkey, o_orderkey, cents,
             ${terms.map(_._1).mkString(" + ")} AS num,
             ${terms.map(_._2).mkString(" + ")} AS den
           FROM c
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC))
         SELECT o_custkey, o_orderkey, cents,
           CAST(num * 1000 // den AS BIGINT) AS ewma_milli
         FROM t ORDER BY o_custkey, o_orderkey"""
    },
    "q_window_ntile_share" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice ASC, o_orderkey ASC) AS INT) AS quartile,
         round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_orderpriority), 6) AS price_share
         FROM orders ORDER BY o_orderpriority, o_orderkey"""
  )
}
