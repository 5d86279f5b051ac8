package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{timestamp_micros, expr, col}

/** Query-catalog plumbing shared by every `graft.queries.*` module.
  *
  * Each module exposes `defs: Map[String, Q]` (name -> query over the test
  * tables in a scale-factor directory) and `oracles: Map[String, String]`
  * (equivalent ANSI SQL the driver runs in DuckDB over the same parquet).
  * `SparkEntry` aggregates them all.
  */
package object queries {
  /** A named catalog query: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Read one driver test table (TESTDATA.md) from a scale-factor dir.
    * `events.ts` has shipped in several parquet layouts (TIMESTAMP(NANOS),
    * TIMESTAMP(MICROS) NTZ, raw INT64 nanos) — `Sources.eventsRawNanos`
    * normalizes them all to epoch-nanos LongType, which is then truncated
    * to a microsecond TimestampType: the same truncation DuckDB applies,
    * so oracle comparisons agree across every layout.
    */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      graft.io.Sources.eventsRawNanos(spark, s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** The driver's test tables (TESTDATA.md) — single source of truth for
    * registration and warmup. */
  val tableNames: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => tbl(spark, dir, n).createOrReplaceTempView(n))

  /** Engine-stable 6-decimal rounding: `floor(x*1e6 + 0.5)/1e6`.
    *
    * `round(x, 6)` diverges between engines when x lands exactly on a
    * decimal .5 boundary: Spark rounds the SHORTEST DECIMAL form of the
    * double (`BigDecimal.valueOf`, HALF_UP — 0.0628125 → 0.062813) while
    * DuckDB rounds the exact binary value (0.06281249999… → 0.062812).
    * Ratio-valued columns (cume_dist = k/n) hit such boundaries for real
    * at 10× scale. floor over pure IEEE arithmetic is bit-identical on
    * both engines; the oracle side is `floor(x*1000000 + 0.5)/1000000`.
    */
  def round6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.floor(c * 1000000d + 0.5d) / 1000000d
}
