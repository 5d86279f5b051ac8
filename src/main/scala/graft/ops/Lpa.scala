package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA) community detection over an edge
  * list — Raghavan et al. 2007, made DETERMINISTIC.
  *
  * Textbook LPA is famously non-reproducible: asynchronous updates and
  * random tie-breaks give a different community structure per run. This
  * implementation pins both axes so the result is a pure function of the
  * graph: (a) SYNCHRONOUS rounds — every node's round-k label is computed
  * from the full round-(k-1) labeling, never from a mix; (b) ties in the
  * neighbor vote break to the SMALLEST candidate label. That determinism
  * is what makes the operator oracle-able at all: DuckDB replays the same
  * `rounds` vote/argmax rounds as materialized CTEs and must reproduce
  * every label bit-for-bit.
  *
  * Semantics: lab_0(v) = v; lab_k(v) = argmax over labels L of
  * |{u : (u,v) edge, lab_{k-1}(u) = L}|, ties to min L. Pure neighbor
  * vote (no self-vote): with a symmetrized edge list every vertex has a
  * neighbor, and the fixed `rounds` horizon makes the known LPA
  * oscillation modes (bipartite flip-flop) a non-issue — the round count
  * is part of the operator's defined semantics, exactly like PageRank's
  * `iters`.
  *
  * Scale shape (100 TB graph): identical to [[PageRank]] — the edge list
  * is repartitioned by `src` ONCE and persisted; each round joins the
  * vertex-sized label table onto that layout, then two combiner-backed
  * aggregations whose shuffle keys are (dst, label) and dst — label-table
  * sized, never edge-sized. The argmax is max(struct(count, -label)):
  * a single map-side-combinable aggregate, no per-node window sort.
  */
object Lpa {

  /** `rounds` synchronous LPA rounds over `edges` (cols `src`, `dst`;
    * pass both directions for an undirected graph). Returns
    * (id, community) — community = the round-`rounds` label.
    * Cache contract: same as [[PageRank.fixedPoint]] — the plan reads a
    * persisted edge frame until the session's cache is cleared. */
  def propagate(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")).persist()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
    for (_ <- 1 to rounds) {
      val votes = e.join(labels, col("id") === col("src"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy(col("dst").as("id"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("lab"))
    }
    labels.select(col("id"), col("lab").as("community"))
  }

  /** The DuckDB replay: `rounds` materialized vote/argmax CTE rounds over
    * the caller's `edgesSql` (must yield symmetrized src,dst). Kept next
    * to the Spark loop so the two derivations can only drift on purpose. */
  def oracleSql(edgesSql: String, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { k =>
      s"""c$k AS (SELECT e.dst AS id, l.lab, count(*) AS c
         FROM edges e JOIN l${k - 1} l ON l.id = e.src GROUP BY 1, 2),
         l$k AS (SELECT id, lab FROM (
           SELECT id, lab, row_number() OVER (PARTITION BY id
             ORDER BY c DESC, lab ASC) AS rn FROM c$k) z WHERE rn = 1)"""
    }.mkString(",\n         ")
    s"""WITH edges AS ($edgesSql),
         l0 AS (SELECT DISTINCT src AS id, src AS lab FROM edges),
         $roundCtes
         SELECT id, lab AS community FROM l$rounds ORDER BY id"""
  }
}
