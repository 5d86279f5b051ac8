package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * of near-duplicate deduplication: verified near-dup PAIRS become
  * clusters, and the dedup pipeline keeps min-id per cluster as the
  * representative (drop the rest).
  *
  * Algorithm: min-label propagation with pointer jumping. `label(v)`
  * starts as v; each round takes the min over neighbor labels, then
  * resolves `label(label(v))` (labels are vertex ids, so they index back
  * into the label table). The jump step is what makes long chains cheap:
  * plain neighbor-min needs diameter rounds, while min-plus-jump
  * converges in O(log diameter) — the same doubling idea as the
  * alternating large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), whose
  * per-round dataflow is this same join+min shape.
  *
  * Execution shape (what matters at both extremes of scale):
  *  - ONE action per round: the convergence count materializes the
  *    persisted `next` frame; no separate convergence join.
  *  - The driver-side loop is control flow only — never a data collect.
  *  - Near-dup edge lists are usually orders of magnitude smaller than
  *    the corpus that produced them, so the loop's shuffle width is sized
  *    from the measured edge count (capped at the session setting): a
  *    300-row graph iterates on 1-2 partitions instead of scheduling
  *    32 tasks × stages × rounds of fixed overhead, while a 10^11-edge
  *    graph keeps the session's full parallelism.
  */
object Components {

  /** Per-vertex component labels: (id, component) where component is the
    * minimum vertex id reachable from `id`. Vertices are the endpoints of
    * `edges` (isolated vertices, belonging to no pair, are not emitted). */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    val edgeCount = sym.count() // materializes the persist; sizes the loop
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // ~64k edges per partition keeps tasks meaningful; never exceed the
    // session setting, never go below 1.
    val parts = math.max(1L, math.min(sessionParts.toLong, edgeCount / 65536 + 1)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id")).persist()
      var iter = 0
      var changed = 1L
      while (changed > 0 && iter < maxIter) {
        iter += 1
        val nbrMin = sym
          .join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src")).agg(min("lbl").as("nbr_lbl"))
        // persisted: the jump self-join references it twice — without the
        // cache the join+agg lineage above would execute once per side
        val propagated = labels
          .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
          .select(col("id"), col("lbl").as("prev"),
            least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
          .persist()
        // pointer jump: component labels are vertex ids, so one self-join
        // resolves lbl -> label(lbl) and doubles propagation distance
        val next = propagated.as("p")
          .join(propagated.select(col("id").as("lbl"), col("lbl").as("lbl2")),
            Seq("lbl"), "left")
          .select(col("id"), col("prev"),
            coalesce(col("lbl2"), col("lbl")).as("lbl"))
          .persist()
        // one action: materializes `next` AND measures convergence
        changed = next.filter(col("lbl") =!= col("prev")).count()
        propagated.unpersist()
        labels.unpersist()
        labels = next
      }
      sym.unpersist()
      if (changed > 0) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
      labels.select(col("id"), col("lbl").as("component"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
