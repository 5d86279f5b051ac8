package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances (synchronous Bellman-Ford over unit
  * weights — the Pregel SSSP shape): every vertex reachable from the
  * seed set gets its minimum hop count. The graph-locality complement of
  * [[Components]] (which answers "same island?") and [[KCore]] ("dense
  * nucleus?"): hop distance answers "how far from the trusted seed set?"
  * — the shape of seed-based trust/contamination propagation over a
  * similarity or citation graph in corpus curation.
  *
  * Determinism: min-distance relaxation is confluent like k-core peeling
  * (relaxing never raises a distance), so the fixpoint is unique and no
  * tie-break is needed. [[distancesConverged]] iterates to that fixpoint
  * with exact stop-on-empty-frontier detection (one cheap count per
  * round) and reports the executed round count for the replay oracle;
  * the fixed-horizon [[distances]] remains for callers that want
  * PageRank's `iters`-style bounded semantics.
  *
  * Scale shape: the edge list is repartitioned by `src` once and
  * persisted; each round is one join of the vertex-sized distance table
  * against that layout plus one min-combine aggregation (map-side
  * partials), shuffling reached-vertex rows only. Rounds localCheckpoint
  * — the distance table is referenced twice per round (carry-over union
  * + frontier join), the same analyzed-plan doubling [[KCore.peel]]
  * documents. O(diameter) rounds.
  */
object Bfs {

  /** Hop distances after `rounds` synchronous relaxations over
    * symmetrized `edges` (cols src, dst) from the seed vertices selected
    * by `seed` (a predicate over the vertex id column `id`). Returns
    * (id, dist) for REACHED vertices only. */
  def distances(edges: DataFrame, seed: org.apache.spark.sql.Column,
                rounds: Int): DataFrame =
    run(edges, seed, rounds, stopOnFixpoint = false)._1

  /** Convergence-driven BFS: relax until a round reaches NO new vertex,
    * up to the `maxRounds` safety cap. Returns the fixpoint distances
    * plus the number of rounds actually executed — the count the
    * round-replay oracle must use to reproduce the result bit-for-bit.
    *
    * Detection is exact and costs one cheap count per round (on the
    * round's already-checkpointed frame): in unit-weight synchronous
    * BFS a vertex's distance is final the first round it is reached
    * (the first reaching round IS its minimum hop), so the reached set
    * only ever GROWS and an unchanged count implies an unchanged table
    * — no deep corpus can silently under-iterate the way a fixed
    * horizon can. */
  def distancesConverged(edges: DataFrame, seed: org.apache.spark.sql.Column,
                         maxRounds: Int = 100): (DataFrame, Int) =
    run(edges, seed, maxRounds, stopOnFixpoint = true)

  private def run(edges: DataFrame, seed: org.apache.spark.sql.Column,
                  rounds: Int, stopOnFixpoint: Boolean): (DataFrame, Int) = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")).persist()
    var dist = e.select(col("src").as("id")).distinct()
      .filter(seed).withColumn("d", lit(0))
    var prevCount = if (stopOnFixpoint) dist.count() else -1L
    var executed = 0
    var converged = false
    while (executed < rounds && !converged) {
      dist = dist
        .unionByName(e.join(dist.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("d") + 1).as("d")))
        .groupBy("id").agg(min("d").as("d"))
        .localCheckpoint(eager = true)
      executed += 1
      if (stopOnFixpoint) {
        val c = dist.count()
        converged = c == prevCount
        prevCount = c
      }
    }
    (dist.select(col("id"), col("d").as("dist")), executed)
  }

  /** The DuckDB replay: the same `rounds` carry-over-union/relax/min CTE
    * rounds, every CTE MATERIALIZED (each round references the previous
    * distance table twice — DuckDB's default inlining re-expands the
    * chain 2^rounds times, the KCore/Bpe blowup shape). `seedSql` is a
    * predicate over column `src` of the edge table. */
  def oracleSql(edgesSql: String, seedSql: String, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (SELECT id, min(d) AS d FROM (
           SELECT id, d FROM d${r - 1}
           UNION ALL
           SELECT e.dst AS id, x.d + 1 AS d
           FROM edges e JOIN d${r - 1} x ON e.src = x.id) u
         GROUP BY id)"""
    }.mkString(",\n         ")
    s"""WITH edges AS MATERIALIZED ($edgesSql),
         d0 AS MATERIALIZED (
           SELECT DISTINCT src AS id, 0 AS d FROM edges WHERE $seedSql),
         $roundCtes
         SELECT id, d AS dist FROM d$rounds ORDER BY id"""
  }
}
