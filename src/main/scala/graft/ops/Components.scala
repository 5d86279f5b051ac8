package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * of near-duplicate deduplication: verified near-dup PAIRS become
  * clusters, and the dedup pipeline keeps min-id per cluster as the
  * representative (drop the rest).
  *
  * Algorithm: iterative min-label propagation. `label(v)` starts as v and
  * each round becomes `min(label(v), neighbors' labels)`; converges in
  * graph-diameter rounds. Near-dup graphs are overwhelmingly tiny cliques
  * and short chains, so rounds stay single-digit in practice; `maxIter`
  * caps pathological chains and the method throws rather than return
  * unconverged labels. Each round is two shuffles (edge join + min-agg) on
  * the distributed edge list — the driver-side loop is control flow only
  * (the Pregel shape), never a data collect. At 10^11-edge scale the
  * round count is the concern, and the published fix is the alternating
  * large-star/small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14) converging in O(log n) rounds —
  * its per-round dataflow is this same join+min shape.
  */
object Components {

  /** Per-vertex component labels: (id, component) where component is the
    * minimum vertex id reachable from `id`. Vertices are the endpoints of
    * `edges` (isolated vertices, belonging to no pair, are not emitted). */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).persist()
    labels.count()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      iter += 1
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src")).agg(min("lbl").as("nbr_lbl"))
      val next = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .persist()
      // one action materializes `next` AND measures convergence
      changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).count()
      labels.unpersist()
      labels = next
    }
    sym.unpersist()
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("lbl").as("component"))
  }
}
