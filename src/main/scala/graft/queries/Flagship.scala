package graft.queries

import graft.ops.IntervalExpand
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship operator — interval expansion
  * (`/root/reference/pyspark_skript/pyspark_script.py:67-124`) — exercised
  * over the driver's `events` table: each event becomes a synthetic sensor
  * interval `[ts, ts + (10 + id%50) sec)` with `1 + id%4` samples, then
  * densified into the uniform per-sample series.
  *
  * The oracle mirrors the reference's floating-point shape exactly:
  * `floor(su + idx*delta)` (cast-to-long of the *sum*, not of `idx*delta`)
  * — IEEE doubles make both engines agree bit-for-bit when the expression
  * trees match. `samples=0`/null quirks (SURVEY §2.8 Q3/Q4) are covered by
  * ScalaTest instead, since DuckDB can't express `sequence(0,-1) = [0,-1]`.
  */
object Flagship {

  /** Deterministic interval-encoded readings derived from `events`. */
  def syntheticReadings(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").select(
      col("event_id"),
      col("ts").as("start_time"),
      timestamp_seconds(unix_timestamp(col("ts")) + (lit(10) + col("event_id") % 50))
        .as("end_time"),
      ((col("event_id") % 4) + 1).cast("int").as("samples"),
      col("value"))

  val defs: Map[String, Q] = Map(
    // sort=false: the catalog query imposes its own total ORDER BY for the
    // oracle compare, so the reference's pre-expansion global sort (Q6)
    // would be a second, wasted range-shuffle here. The reference-shaped
    // pre-sort remains the default of IntervalExpand.faithful and is
    // exercised by graft.io.Pipeline.run.
    "q_interval_expand" -> ((s, dir) =>
      IntervalExpand.faithful(syntheticReadings(s, dir), sort = false)
        .orderBy("event_id", "start_time", "end_time")),
    "q_interval_expand_strict" -> ((s, dir) =>
      IntervalExpand.strict(syntheticReadings(s, dir))
        .select(col("event_id"), col("sample_idx"),
          col("start_time").cast("string").as("start_time"),
          col("end_time").cast("string").as("end_time"), col("value"))
        .orderBy("event_id", "sample_idx"))
  )

  val oracles: Map[String, String] = Map(
    "q_interval_expand" ->
      """WITH r AS (
           SELECT event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS su,
             (10 + event_id % 50) / (event_id % 4 + 1) AS delta
           FROM events),
         e AS (SELECT event_id, value, su, delta,
                      unnest(range(0, event_id % 4 + 1)) AS idx FROM r)
         SELECT event_id,
           strftime(make_timestamp(CAST(floor(su + idx * delta) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS start_time,
           strftime(make_timestamp(CAST(floor(su + (idx + 1) * delta) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS end_time,
           value
         FROM e ORDER BY event_id, start_time, end_time""",
    // Strict mode: last row's end_time equals the original interval end.
    "q_interval_expand_strict" ->
      """WITH r AS (
           SELECT event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS su,
             CAST(event_id % 4 + 1 AS INT) AS samples,
             (10 + event_id % 50) / (event_id % 4 + 1) AS delta
           FROM events),
         e AS (SELECT event_id, value, su, samples, delta,
                      CAST(unnest(range(0, samples)) AS INT) AS sample_idx FROM r)
         SELECT event_id, sample_idx,
           strftime(make_timestamp(CAST(floor(su + sample_idx * delta) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS start_time,
           CASE WHEN sample_idx = samples - 1
             THEN strftime(make_timestamp((su + (10 + event_id % 50)) * 1000000),
                           '%Y-%m-%d %H:%M:%S')
             ELSE strftime(make_timestamp(CAST(floor(su + (sample_idx + 1) * delta) AS BIGINT) * 1000000),
                           '%Y-%m-%d %H:%M:%S') END AS end_time,
           value
         FROM e ORDER BY event_id, sample_idx"""
  )
}
