package graft.queries

import graft.functions.GeoMean
import org.apache.spark.sql.functions._

/** UDF-surface demos — one of each extension tier (SURVEY §2.7):
  * Scala UDF, typed Aggregator UDAF, custom Catalyst Expression (see
  * LlmOps.q_sim_topk_native), and a generator-style explode.
  * The plain UDF is deliberately the only one in the catalog: everything
  * else stays codegen-friendly.
  */
object UdfDemo {

  val defs: Map[String, Q] = Map(
    // Scala UDF (serialized closure — the slow path, shown once).
    "q_udf_scale" -> ((s, dir) => {
      val toFahrenheit = udf((c: Double) => c * 1.8 + 32)
      tbl(s, dir, "events")
        .select(col("event_id"), round(toFahrenheit(col("value")), 6).as("fahrenheit"))
        .orderBy("event_id")
    }),
    // Typed Aggregator UDAF: geometric mean of order totals per status.
    "q_udaf_geomean" -> ((s, dir) => {
      val geo = udaf(GeoMean)
      tbl(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(round(geo(col("o_totalprice")), 4).as("geo_mean"))
        .orderBy("o_orderstatus")
    }),
    // Generator-style UDTF: explode a computed array into rows.
    "q_udtf_explode" -> ((s, dir) =>
      tbl(s, dir, "supplier")
        .select(col("s_suppkey"),
          explode(sequence(lit(1), (col("s_suppkey") % 3 + 1).cast("int"))).as("slot"))
        .orderBy("s_suppkey", "slot")),
    // SQL-registered native expressions (SparkSessionExtensions path):
    // the same codegen'd CosineSimilarity kernel, reached through
    // spark.sql(...) by name — proving SQL-only users get the native
    // function surface, not a UDF fallback. Rank-ordered output (ids, not
    // raw doubles) keeps the oracle float-precision-proof, mirroring
    // q_sim_topk_native.
    "q_sql_native_fns" -> ((s, dir) => {
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      tbl(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
      s.sql(
        """SELECT query_id, rnk, neighbor_id FROM (
             SELECT q.vec_id AS query_id,
               CAST(row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY cosine_similarity(q.embedding, c.embedding) DESC,
                          c.vec_id ASC) AS INT) AS rnk,
               c.vec_id AS neighbor_id
             FROM graft_embeddings q JOIN graft_embeddings c
               ON q.vec_id <> c.vec_id
             WHERE q.vec_id >= 40 AND q.vec_id < 60)
           WHERE rnk <= 5
           ORDER BY query_id, rnk""")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_udf_scale" ->
      """SELECT event_id, round(value * 1.8 + 32, 6) AS fahrenheit
         FROM events ORDER BY event_id""",
    // FILTER inside the aggregate (not WHERE): a group with no positive
    // totals must still appear with geo_mean 0.0 — matching the
    // Aggregator's finish() on an empty buffer — not vanish from output.
    "q_udaf_geomean" ->
      """SELECT o_orderstatus,
         round(coalesce(exp(avg(ln(o_totalprice)) FILTER (WHERE o_totalprice > 0)), 0.0), 4) AS geo_mean
         FROM orders
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_udtf_explode" ->
      """SELECT s_suppkey, CAST(unnest(range(1, s_suppkey % 3 + 2)) AS INT) AS slot
         FROM supplier ORDER BY s_suppkey, slot""",
    "q_sql_native_fns" ->
      """SELECT q.vec_id AS query_id,
           CAST(row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                             CAST(c.embedding AS DOUBLE[])) DESC,
                      c.vec_id ASC) AS INT) AS rnk,
           c.vec_id AS neighbor_id
         FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         WHERE q.vec_id >= 40 AND q.vec_id < 60
         QUALIFY rnk <= 5
         ORDER BY query_id, rnk"""
  )
}
