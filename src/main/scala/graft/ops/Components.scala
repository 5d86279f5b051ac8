package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * Substrate: this is the library's one deliberate RDD loop. A DataFrame
  * fixpoint builds brand-new logical plans every round, and each round
  * pays Catalyst analysis + whole-stage-codegen compilation for plans
  * that execute once — measured at ~0.5 s/job × ~9 jobs/round on a
  * 14-edge graph (12 s total for a trivial input). The RDD loop plans
  * nothing per round and, more importantly, lets every round's joins run
  * NARROW against one shared HashPartitioner:
  *  - `sym` (the symmetric edge list) is hash-partitioned by src ONCE and
  *    never moves again — at 10^11 edges this is the dataset you cannot
  *    afford to reshuffle per round (the same reason GraphX partitions
  *    its edge RDD once and iterates against it).
  *  - per round only vertex-sized label tables shuffle: the neighbor-min
  *    `reduceByKey` (map-side combined) and the pointer-jump re-key.
  *  - ONE action per round: the convergence count materializes the new
  *    label RDD; the driver loop is control flow only, never a data
  *    collect.
  * Partition width is sized from the measured edge count (capped at the
  * session's shuffle setting): a 300-edge graph iterates on 1 partition
  * instead of scheduling 32 tasks × rounds of fixed overhead, while a
  * huge graph keeps full parallelism.
  */
object Components {

  /** Per-vertex component labels: (id, component) where component is the
    * minimum vertex id reachable from `id`. Vertices are the endpoints of
    * `edges` (isolated vertices, belonging to no pair, are not emitted).
    * Vertex ids must be integral (they are cast to long). */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // refuse non-integral id columns rather than silently truncating
    // (10.2 and 10.9 must not merge into vertex 10) or NPE-ing on strings
    Seq(aCol, bCol).foreach { c =>
      val dt = edges.schema(c).dataType
      require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
        s"vertex id column '$c' must be integral, got ${dt.typeName}")
    }
    val raw = edges.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = raw.count() // one upstream execution; sizes the loop
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // ~64k edges per partition keeps tasks meaningful; never exceed the
    // session setting, never go below 1.
    val nParts =
      math.max(1L, math.min(sessionParts.toLong, edgeCount / 65536 + 1)).toInt
    val part = new HashPartitioner(nParts)
    // the one-time edge shuffle; every later `sym.join(labels)` is narrow
    val sym = raw.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    sym.count() // materialize from raw's cache before dropping it
    raw.unpersist()
    var labels = sym.keys.distinct(nParts).map(v => (v, v))
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      iter += 1
      // narrow join (both sides share `part`); reduceByKey is the round's
      // edge-driven shuffle, map-side combined down to vertex cardinality
      val nbrMin = sym.join(labels)
        .map { case (_, (dst, lbl)) => (dst, lbl) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      // narrow: labels and nbrMin are both partitioned by `part`
      val prop = labels.leftOuterJoin(nbrMin)
        .mapValues { case (l, nl) => math.min(l, nl.getOrElse(l)) }
        .persist(StorageLevel.MEMORY_AND_DISK) // jump reads it twice
      // pointer jump: labels are vertex ids, so re-keying by label and
      // joining back onto prop resolves lbl -> label(lbl)
      val next = prop.map { case (v, l) => (l, v) }
        .leftOuterJoin(prop)
        .map { case (l, (v, l2)) => (v, l2.getOrElse(l)) }
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // one action: materializes `next` AND measures convergence (the
      // comparison join with the old labels is narrow)
      changed = next.join(labels)
        .filter { case (_, (n, p)) => n != p }.count()
      prop.unpersist()
      labels.unpersist()
      labels = next
    }
    sym.unpersist()
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds")
    labels.toDF("id", "component")
  }
}
