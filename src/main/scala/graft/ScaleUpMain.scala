package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator: writes an N× copy of a TESTDATA.md
  * scale-factor directory for local scale validation (e.g. sf0.1 × 10 →
  * "sf1"), preserving every join relationship the catalog exercises.
  *
  * TESTDATA.md forbids touching `/root/testdata`, so the output goes to a
  * caller-chosen scratch dir; this is measurement tooling, not test-data
  * authorship — the driver's generator stays the source of truth.
  *
  * Replication strategy (replica 0 is the untouched original):
  *  - Fixed dimensions (`region`, `nation`) are copied verbatim — they do
  *    not scale in a star schema.
  *  - Every scaling table is unioned N times with its keys offset by
  *    `i * (max(key)+1)` per key-space, so foreign keys stay aligned
  *    WITHIN a replica and never collide across replicas (orders→customer,
  *    lineitem→orders/part/supplier, events.user_id→customer).
  *  - `documents.text` is passed through a per-replica alphabet
  *    permutation (`translate`) — length-preserving (so `n_chars` stays
  *    consistent) but shingle-destroying, so replicas are NOT planted
  *    near-duplicates and dedup/LSH workloads keep realistic candidate
  *    densities instead of every doc carrying N−1 synthetic twins.
  *  - `embeddings.embedding` is component-rotated per replica —
  *    norm-preserving, but cosine across replicas decorrelates, for the
  *    same reason.
  *  - `events.ts` is rewritten as raw INT64 nanos in the same time window
  *    (N× density, unchanged span) — exactly what `queries.tbl` and
  *    `StreamOps.eventsStream` read; watermark/window semantics scale
  *    without shifting.
  */
object ScaleUpMain {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame, files: Int): Unit = {
      df.coalesce(files).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$name.parquet")
      println(s"[scaleup] wrote $name x$factor")
    }
    /** Union `factor` key-offset replicas. `keys` maps column → stride
      * (max+1 of its key-space); `tweak` decorrelates payload columns. */
    def rep(df: DataFrame, keys: Map[String, Long],
            tweak: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val offset = keys.foldLeft(df) { case (d, (k, stride)) =>
          d.withColumn(k, col(k) + lit(stride * i))
        }
        tweak(offset, i)
      }.reduce(_ unionByName _)
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(key)).head().getLong(0) + 1L

    val customer = spark.read.parquet(s"$src/customer.parquet")
    val supplier = spark.read.parquet(s"$src/supplier.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val documents = spark.read.parquet(s"$src/documents.parquet")
    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    // events.ts is TIMESTAMP(NANOS): read as raw nanos (the catalog's own
    // read path), written back as plain INT64 nanos
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$src/events.parquet")

    val (custS, suppS, partS) =
      (stride(customer, "c_custkey"), stride(supplier, "s_suppkey"),
        stride(part, "p_partkey"))
    val (ordS, evS, docS, vecS) =
      (stride(orders, "o_orderkey"), stride(events, "event_id"),
        stride(documents, "doc_id"), stride(embeddings, "vec_id"))

    // fixed dims: verbatim copy
    write("region", spark.read.parquet(s"$src/region.parquet"), 1)
    write("nation", spark.read.parquet(s"$src/nation.parquet"), 1)

    write("customer", rep(customer, Map("c_custkey" -> custS)), 2)
    write("supplier", rep(supplier, Map("s_suppkey" -> suppS)), 1)
    write("part", rep(part, Map("p_partkey" -> partS)), 2)
    write("orders", rep(orders, Map(
      "o_orderkey" -> ordS, "o_custkey" -> custS)), 8)
    write("lineitem", rep(lineitem, Map(
      "l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS)), 16)
    // user_id lives in the c_custkey key-space (stream-static join)
    write("events", rep(events, Map(
      "event_id" -> evS, "user_id" -> custS)), 8)

    // per-replica alphabet permutation: rotate a–z (and A–Z) by a shift
    // that can never wrap back to 0 — a plain 7*i shift is the identity
    // whenever 7*i % 26 == 0 (replica 26 would carry byte-identical text
    // to replica 0, planting exact cross-replica duplicates that skew
    // dedup/LSH candidate density). 1 + (7*i) % 25 stays in [1, 25] for
    // every i >= 1, so every replica's text is permuted.
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    write("documents", rep(documents, Map("doc_id" -> docS),
      (d, i) =>
        if (i == 0) d
        else {
          val k = 1 + (7 * i) % 25
          d.withColumn("text", translate(col("text"),
            lower + lower.toUpperCase,
            rot(lower, k) + rot(lower, k).toUpperCase))
        }), 4)

    // per-replica component rotation: norm-preserving, cross-replica
    // cosine decorrelated. Same non-wrapping shift shape as the text
    // rotation above: 1 + (7*i) % (dim-1) is never 0 mod dim for i >= 1,
    // so no replica carries component-identical vectors to replica 0.
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    write("embeddings", rep(embeddings, Map("vec_id" -> vecS),
      (d, i) => {
        val k = if (i == 0) 0 else 1 + (7 * i) % (dim - 1)
        if (k == 0) d
        else d.withColumn("embedding",
          concat(slice(col("embedding"), k + 1, dim - k),
            slice(col("embedding"), 1, k)))
      }), 4)

    spark.stop()
  }
}
