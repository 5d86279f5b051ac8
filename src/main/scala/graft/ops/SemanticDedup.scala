package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): embedding-space near-duplicates — paraphrases,
  * re-renders, boilerplate variants that no lexical dedup (MinHash /
  * SimHash / exact hash) can see — found by k-means BLOCKING plus a
  * within-cluster cosine threshold, never an all-pairs comparison.
  *
  * Pipeline: (1) cluster the embedding space with the same cheap coarse
  * quantizer IVF uses (random init, few iterations — blocking needs rough
  * balance, not converged clusters); (2) within each cluster, find pairs
  * above the similarity threshold with the chunk-salted exact pair join
  * ([[Similarity.thresholdPairs]] — hot clusters fan out to chunks²
  * balanced tasks); (3) drop every document that has an over-threshold
  * neighbor with a SMALLER id in its cluster.
  *
  * The drop rule is ONE PASS — no iterative component closure. It differs
  * from connected-components keep-min (`q_dedup_embedding`) exactly on
  * transitive chains: under CC keep-min, a doc over-threshold only to
  * another DROPPED doc still collapses into that component and drops with
  * it, and a star's far leaves drop despite being dissimilar to each
  * other; here a doc drops iff it personally exceeds the threshold
  * against some smaller id. For curation that is the safer semantics (no
  * transitive over-dropping) and the cheaper plan: the decision is a
  * distinct over the pair list plus one join back — no O(log diameter)
  * label-propagation rounds over the edge list.
  *
  * Scale shape at 100 TB: k-means blocking bounds pair work at
  * O(Σ n_cluster²) with clusters balanced BY CONSTRUCTION (unlike LSH
  * buckets under skewed embedding mass); the dropped-id set is near-dup
  * sized — orders of magnitude smaller than the corpus — so the keep-list
  * join broadcasts under AQE; fit the quantizer on a corpus sample and
  * reuse it across batches (the [[Similarity.fitIvf]] fit-once contract).
  */
object SemanticDedup {

  /** k-means cluster assignment — the SemDeDup blocking step. Seeded and
    * deterministic under a fixed input partitioning (the same stance as
    * the IVF quantizer it mirrors). Init is k-means|| — NOT the cheaper
    * random init IVF uses — because a dedup corpus is by hypothesis
    * duplicate-heavy: random init samples ROWS, and two identical rows
    * chosen as centers collapse to fewer than k distinct centers (Spark
    * 4.1's block trainer then throws outright). k-means|| weights center
    * candidates by distance², so a duplicate of an already-picked center
    * has zero probability — distinct centers by construction. */
  def assignClusters(embeddings: DataFrame, idCol: String, embCol: String,
                     k: Int, seed: Long = 42, maxIter: Int = 5): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings
      .withColumn("__fv", array_to_vector(col(embCol).cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("k-means||").setFeaturesCol("__fv").fit(feat)
    model.transform(feat)
      .select(col(idCol), col(embCol), col("prediction").as("cluster"))
  }

  /** Per-document keep/drop decision: (idCol, cluster, dropped). A row is
    * dropped iff some same-cluster document with a smaller id scores
    * `sim > threshold` against it. */
  def dedup(embeddings: DataFrame, idCol: String, embCol: String,
            k: Int, threshold: Double, chunks: Int = 8, seed: Long = 42,
            sim: (Column, Column) => Column): DataFrame =
    dedupAssigned(assignClusters(embeddings, idCol, embCol, k, seed),
      idCol, embCol, threshold, chunks, sim)

  /** The fitted blocking centroids alone — [[assignClusters]]' k-means||
    * fit without the assignment, for callers that assign via
    * [[nearestCentroid]] so the oracle can replay the decision. */
  def fitCentroids(embeddings: DataFrame, embCol: String, k: Int,
                   seed: Long = 42, maxIter: Int = 5): Seq[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings
      .withColumn("__fv", array_to_vector(col(embCol).cast("array<double>")))
    new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("k-means||").setFeaturesCol("__fv").fit(feat)
      .clusterCenters.map(_.toArray).toSeq
  }

  /** Nearest-centroid assignment as a pure Column expression — map-side,
    * zero-shuffle blocking (centroids ride along as literals, the way the
    * IVF probe and PQ codebooks do). The fold visits clusters in index
    * order with a strict `<`, so ties keep the SMALLEST cluster id, and
    * the distance is the sequential left fold Σ(a_i − c_i)² in doubles —
    * the exact operation order [[oracleSql]]'s generated DuckDB replays
    * (`list_reduce` over `list_transform`), making the assignment
    * reproducible across both engines rather than an opaque ML-model
    * verdict (`KMeansModel.transform` scores with a norm-precomputed
    * `fastSquaredDistance` whose FP rounding no SQL engine replays). */
  def nearestCentroid(emb: Column, centroids: Seq[Array[Double]]): Column =
    nearestCentroidDist(emb, centroids).getField("c")

  /** [[nearestCentroid]] keeping the winning squared distance too:
    * struct(d double, c int). Same fold, same tie rule. */
  def nearestCentroidDist(emb: Column, centroids: Seq[Array[Double]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cents = array(centroids.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)
    aggregate(
      sequence(lit(0), lit(centroids.length - 1)),
      struct(lit(Double.PositiveInfinity).as("d"), lit(0).as("c")),
      (acc, i) => {
        val d = aggregate(
          zip_with(emb.cast("array<double>"), element_at(cents, i + lit(1)),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (s, x) => s + x)
        when(d < acc.getField("d"),
          struct(d.as("d"), i.cast("int").as("c"))).otherwise(acc)
      },
      acc => acc)
  }

  /** GENERATE the DuckDB oracle for a [[dedupAssigned]] run whose blocking
    * was [[nearestCentroid]] over these centroids — the same move as
    * `PageRank.oracleSql`: the deterministic, seeded fit's output is
    * embedded as literals and every DOWNSTREAM decision (assignment
    * argmin, within-cluster cosine threshold, smaller-id drop rule) is
    * replayed in SQL. `Double.toString` literals round-trip (Java prints
    * enough digits to re-parse to the same bits; DuckDB's parse is
    * correctly rounded), so both engines fold the same 64 doubles in the
    * same order. Ties in the argmin break to the smallest cluster id on
    * both sides. */
  private def centroidRows(centroids: Seq[Array[Double]]): String =
    centroids.zipWithIndex.map { case (c, i) =>
      s"($i, CAST([${c.map(java.lang.Double.toString).mkString(", ")}] AS DOUBLE[]))"
    }.mkString(", ")

  /** GENERATE the DuckDB oracle for the per-cluster fit-stats query
    * (`q_embed_kmeans`): assignment argmin replayed from centroid
    * literals exactly as [[oracleSql]], then counts and inertia. The
    * winning squared distance is floor-quantized to integer micro-units
    * PER ROW before the cluster sum, so inertia is exact long arithmetic
    * on both engines (a double Σd² would depend on summation order). */
  def statsOracleSql(centroids: Seq[Array[Double]]): String = {
    s"""WITH cents(cluster, cent) AS (VALUES ${centroidRows(centroids)}),
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       dist AS (
         SELECT e.vec_id, c.cluster,
           list_reduce(list_transform(range(1, len(c.cent) + 1),
             i -> (e.emb[i] - c.cent[i]) * (e.emb[i] - c.cent[i])),
             (acc, x) -> acc + x) AS d
         FROM e CROSS JOIN cents c),
       assigned AS (
         SELECT vec_id, cluster, CAST(floor(d * 1000000.0) AS BIGINT) AS dm
         FROM (
           SELECT vec_id, cluster, d,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d ASC, cluster ASC) AS rn
           FROM dist) t
         WHERE rn = 1)
       SELECT cluster, count(*) AS n_vecs,
         CAST(sum(dm) AS BIGINT) AS inertia_micro,
         CAST(sum(dm) // count(*) AS BIGINT) AS avg_dist_micro
       FROM assigned GROUP BY cluster ORDER BY cluster"""
  }

  def oracleSql(centroids: Seq[Array[Double]], threshold: Double): String = {
    val rows = centroidRows(centroids)
    s"""WITH cents(cluster, cent) AS (VALUES $rows),
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       dist AS (
         SELECT e.vec_id, c.cluster,
           list_reduce(list_transform(range(1, len(c.cent) + 1),
             i -> (e.emb[i] - c.cent[i]) * (e.emb[i] - c.cent[i])),
             (acc, x) -> acc + x) AS d
         FROM e CROSS JOIN cents c),
       assigned AS (
         SELECT vec_id, cluster FROM (
           SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d ASC, cluster ASC) AS rn
           FROM dist) t
         WHERE rn = 1),
       pairs AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM assigned a JOIN assigned b
           ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         JOIN e ea ON ea.vec_id = a.vec_id
         JOIN e eb ON eb.vec_id = b.vec_id
         WHERE list_cosine_similarity(ea.emb, eb.emb) > $threshold),
       dropped AS (SELECT DISTINCT id_b FROM pairs)
       SELECT a.vec_id, a.cluster, (d.id_b IS NOT NULL) AS dropped
       FROM assigned a LEFT JOIN dropped d ON d.id_b = a.vec_id
       ORDER BY a.vec_id"""
  }

  /** The drop rule over a PRE-BLOCKED corpus (`cluster` column present) —
    * bring your own blocking: [[assignClusters]], a fitted IVF index's
    * list ids ([[Similarity.fitIvf]] writes exactly this layout), or any
    * partition key that co-locates candidate near-dups. */
  def dedupAssigned(assigned: DataFrame, idCol: String, embCol: String,
                    threshold: Double, chunks: Int,
                    sim: (Column, Column) => Column): DataFrame = {
    val pairs = Similarity.thresholdPairs(assigned, "cluster", idCol, embCol,
      threshold, chunks, sim)
    // thresholdPairs emits id_a < id_b only, so the dropped set is exactly
    // the distinct right-hand ids — near-dup sized, broadcastable
    val dropped = pairs.select(col("id_b").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    assigned.select(col(idCol), col("cluster"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("__drop"), lit(false)).as("dropped"))
  }
}
