package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Seidman 1983; the
  * Batagelj-Zaversnik distributed formulation): repeatedly delete every
  * vertex whose degree IN THE SURVIVING SUBGRAPH is below k — the
  * fixpoint is the maximal subgraph where every vertex keeps >= k
  * neighbors, the standard "dense backbone" extraction (spam-farm and
  * community-nucleus detection on web/co-occurrence graphs).
  *
  * Determinism: peeling is CONFLUENT — the fixpoint is unique regardless
  * of deletion order (deleting a vertex never raises another's degree),
  * so unlike LPA no tie-break pinning is needed; synchronous rounds are
  * chosen because each round is one join + one aggregation.
  * [[peelConverged]] iterates to the fixpoint with exact
  * stop-on-no-removal detection (one cheap count per round) and reports
  * the executed round count for the replay oracle; the fixed-horizon
  * [[peel]] remains for callers that want PageRank's `iters`-style
  * bounded semantics.
  *
  * Scale shape (100 TB graph): the edge list is repartitioned by `src`
  * once and persisted; each round joins the vertex-sized survivor set
  * onto both endpoints (semi-joins — no payload) and re-aggregates
  * degrees with map-side combine. Per-round shuffles are vertex-sized;
  * edges never reshuffle. O(peel depth) rounds, each strictly shrinking
  * the survivor set.
  */
object KCore {

  /** Survivors of `rounds` synchronous k-core peels over symmetrized
    * `edges` (cols src, dst, both directions), with their in-core
    * degree. Each round TRUNCATES LINEAGE with an eager localCheckpoint
    * (the Bpe persist-swap pattern): the survivor frame is consumed
    * TWICE per round (one semi-join per endpoint), so a lazy chain
    * doubles the LOGICAL PLAN every round — by round 8 the analyzer
    * walks a 2^8-reference tree and the driver OOMs before a single
    * task runs (persist alone does not help: caching dedupes execution,
    * not the analyzed plan object). Checkpointing makes each round
    * exactly one vertex-sized job over a constant-size plan, the honest
    * per-round price every iterative loop here pays (Components
    * materializes its RDD per pointer-jump round the same way). Cache
    * contract for the edge frame: same as [[PageRank.fixedPoint]]. */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    run(edges, k, rounds, stopOnFixpoint = false)._1

  /** Convergence-driven peeling: peel until a round removes NO vertex,
    * up to the `maxRounds` safety cap. Returns the true k-core plus the
    * number of rounds actually executed — the count the round-replay
    * oracle must use to reproduce the result bit-for-bit.
    *
    * Detection is exact and costs one cheap count per round (on the
    * round's already-checkpointed survivor frame): survivor sets only
    * ever SHRINK (peeling deletes, never restores), so an unchanged
    * count implies an unchanged set, and an unchanged set means every
    * surviving degree is already >= k — the fixpoint. A corpus whose
    * peel depth exceeds any fixed horizon converges here regardless. */
  def peelConverged(edges: DataFrame, k: Int,
                    maxRounds: Int = 100): (DataFrame, Int) =
    run(edges, k, maxRounds, stopOnFixpoint = true)

  private def run(edges: DataFrame, k: Int, rounds: Int,
                  stopOnFixpoint: Boolean): (DataFrame, Int) = {
    require(k >= 1 && rounds >= 1, s"k=$k rounds=$rounds must be >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")).persist()
    def shrink(act: DataFrame) = e
      .join(act.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(act.select(col("id").as("dst")), Seq("dst"), "left_semi")
    var active = e.select(col("src").as("id")).distinct()
    var prevCount = if (stopOnFixpoint) active.count() else -1L
    var executed = 0
    var converged = false
    while (executed < rounds && !converged) {
      active = shrink(active)
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("id")
        .localCheckpoint(eager = true)
      executed += 1
      if (stopOnFixpoint) {
        val c = active.count()
        converged = c == prevCount
        prevCount = c
      }
    }
    (shrink(active)
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("core_degree")),
      executed)
  }

  /** The DuckDB replay: the same `rounds` restrict/re-degree/threshold
    * CTE rounds over the caller's symmetrized `edgesSql`. Kept next to
    * the Spark loop so the two derivations can only drift on purpose.
    * Every CTE is AS MATERIALIZED: each round references the previous
    * survivor set TWICE (one join per endpoint) and the edge table once,
    * so DuckDB's default inlining re-expands the whole chain 2^rounds
    * times — the Bpe-oracle blowup shape, and the exact SQL mirror of
    * why the Spark loop localCheckpoints per round. */
  def oracleSql(edgesSql: String, k: Int, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""a$r AS MATERIALIZED (SELECT e.src AS id FROM edges e
           JOIN a${r - 1} x ON e.src = x.id
           JOIN a${r - 1} y ON e.dst = y.id
           GROUP BY e.src HAVING count(*) >= $k)"""
    }.mkString(",\n         ")
    s"""WITH edges AS MATERIALIZED ($edgesSql),
         a0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
         $roundCtes
         SELECT e.src AS id, count(*) AS core_degree
         FROM edges e
         JOIN a$rounds x ON e.src = x.id
         JOIN a$rounds y ON e.dst = y.id
         GROUP BY e.src ORDER BY id"""
  }
}
