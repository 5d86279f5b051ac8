package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[cosine]] — pure Column-DSL cosine (zip_with + aggregate, all double).
  * - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *   against every candidate; one pass over the big side, no shuffle of the
  *   candidate table. Correct at any scale where queries fit in a broadcast.
  * - [[lshBuckets]] / [[lshTopK]] — random-hyperplane LSH: b sign-bits
  *   bucket the space; top-k runs only within matching buckets. The scale
  *   path: candidate fan-in per query drops from N to N/2^bits (expected),
  *   and the bucket join is a plain shuffle join on the signature.
  */
object Similarity {

  /** Dot product in double precision via zip_with + aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm — same HOF summation shape as [[dot]], so
    * `dot(a,b) / (sqrt(sqNorm(a)) * sqrt(sqNorm(b)))` is bit-identical to
    * [[cosine]] while letting callers hoist the norms out of the pair loop. */
  def sqNorm(a: Column): Column =
    aggregate(transform(a.cast("array<double>"), x => x * x),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity in double precision via zip_with + aggregate. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(sqNorm(a)) * sqrt(sqNorm(b)))

  /** Exact top-k via HOF cosine with per-row norms precomputed *before*
    * the pair join — HOF lambdas are interpreted (CodegenFallback), so
    * moving 2 of the 3 array passes from O(|q|·|c|) pairs to O(|q|+|c|)
    * rows cuts the dominant cost by ~3x while producing the identical IEEE
    * result as [[cosine]] per pair. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val norm = sqrt(sqNorm(col("embedding")))
    val scored = candidates
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), norm.as("c_norm"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), norm.as("q_norm"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
    rankTopK(scored, k)
  }

  /** Exact top-k neighbors with a caller-supplied similarity — e.g. the
    * codegen'd native `cosine_sim` expression. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     sim: (Column, Column) => Column): DataFrame = {
    val scored = candidates
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", sim(col("q_emb"), col("c_emb")))
    rankTopK(scored, k)
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
  }

  /** The seeded hyperplane set `lshBuckets` hashes with — exposed so the
    * generated DuckDB oracle can embed the SAME planes as literals and
    * replay the sign bits exactly (java.util.Random's Gaussian stream is
    * deterministic; Double.toString round-trips). */
  def lshPlanes(dim: Int, bits: Int, seed: Long = 42): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Hyperplanes are deterministic (seeded) and broadcast as literals. */
  def lshBuckets(df: DataFrame, dim: Int, bits: Int = 8, seed: Long = 42): DataFrame = {
    val planes = lshPlanes(dim, bits, seed)
    val emb = col("embedding").cast("array<double>")
    val sig = (0 until bits).map { b =>
      val plane = array(planes(b).toIndexedSeq.map(v => lit(v)): _*)
      val dot = aggregate(zip_with(emb, plane, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("bucket", sig)
  }

  /** A fitted IVF index: the coarse-quantizer centroids plus the corpus
    * written to `path` PARTITIONED BY `list_id` — the on-disk layout that
    * lets probes read only their lists' partitions. Centroids are tiny
    * (nLists × dim floats) and live on the driver, like any ANN index's
    * coarse level. */
  final case class IvfIndex(path: String, centroids: Array[Array[Float]]) {
    def nLists: Int = centroids.length
  }

  /** Fit the IVF coarse quantizer ONCE and materialize the inverted-list
    * layout: k-means over the corpus, then the corpus written partitioned
    * by `list_id`. This is the expensive half of IVF — a handful of Spark
    * jobs plus one partitioned write — and it runs per CORPUS, not per
    * query batch; [[probeIvf]] then serves any number of query batches
    * against the same index (the round-3 implementation refit on every
    * invocation, ~5 jobs of index build inside each query).
    *
    * Coarse quantization needs rough balance, not converged clusters:
    * random init + few iterations keeps the fit cheap (k-means|| init
    * alone runs ~2 jobs per round over the corpus). List sizes are
    * balanced by construction — unlike LSH, no bucket blows up on skew.
    *
    * The assignment pass uses [[SemanticDedup.nearestCentroid]]'s
    * explicit argmin fold over the SAME float-rounded centroids the index
    * records — not `KMeansModel.transform`, whose norm-precomputed
    * `fastSquaredDistance` rounding no other engine replays. Identical
    * semantics (euclidean argmin, ties to the smallest list), but the
    * layout is now a pure function of (corpus, recorded centroids), which
    * is what lets [[ivfAnnOracleSql]] replay the whole index from
    * centroid literals. */
  def fitIvf(embeddings: DataFrame, nLists: Int, indexDir: String,
             seed: Long = 42, maxIter: Int = 5): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings
      .withColumn("__fv", array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random").setFeaturesCol("__fv").fit(feat)
    val cents = model.clusterCenters.map(_.toArray.map(_.toFloat))
    embeddings
      .select(col("vec_id"), col("embedding"),
        SemanticDedup.nearestCentroid(col("embedding"),
          cents.toIndexedSeq.map(_.map(_.toDouble))).as("list_id"))
      .write.partitionBy("list_id").mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(indexDir)
    // stamp the coarse level next to the lists (data first, sidecar
    // second — the signature-index crash contract): a fresh JVM then
    // probes via [[loadIvf]] instead of paying the fit again
    graft.io.SketchStore.saveIvfCentroids(embeddings.sparkSession, indexDir, cents)
    IvfIndex(indexDir, cents)
  }

  /** Reopen a [[fitIvf]] index from its directory alone — the restart
    * path of the fit-once/probe-many contract. The centroids come from
    * the `_ivf_centroids` sidecar bit-exactly, so a probe against the
    * loaded index is bit-identical to one against the fitting JVM's
    * in-memory handle (SketchStoreSpec). Refuses a sidecar-less dir. */
  def loadIvf(spark: org.apache.spark.sql.SparkSession, indexDir: String): IvfIndex =
    IvfIndex(indexDir, graft.io.SketchStore.loadIvfCentroids(spark, indexDir))

  /** Probe a fitted IVF index: each query scores only the corpus rows in
    * the inverted lists of its `nProbe` nearest centroids. Candidate
    * fan-in per query drops from N to ~N·nProbe/nLists — and because the
    * index is PARTITIONED by `list_id` and the (broadcast) probe side
    * joins on it, Spark's dynamic partition pruning drops unprobed
    * partitions at the SCAN: the corpus I/O itself shrinks by
    * ~nProbe/nLists, not just the join input (plan-asserted in
    * PlanContractSpec). Scoring uses the codegen'd native cosine. */
  def probeIvf(spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
               queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.graft.CosineSimilarity.cosine_sim
    require(nProbe >= 1 && nProbe <= index.nLists,
      s"nProbe=$nProbe out of range [1, ${index.nLists}]")
    val corpus = spark.read.parquet(index.path)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("list_id"))
    def centroidLit(i: Int): Column = array(index.centroids(i).map(v => lit(v)).toSeq: _*)
    // per-query probe list: nProbe centroids by cosine, deterministic ties
    val probeSims = array((0 until index.nLists).map { i =>
      struct(lit(i).as("list_id"), cosine_sim(col("q_emb"), centroidLit(i)).as("csim"))
    }: _*)
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("p.csim").desc, col("p.list_id").asc)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .select(col("query_id"), col("q_emb"), explode(probeSims).as("p"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("p.list_id").as("list_id"))
    val scored = corpus.join(broadcast(probes), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine_sim(col("q_emb"), col("c_emb")))
    rankTopK(scored, k)
  }

  /** Self-contained IVF ANN demo: fit to a fresh temp index dir, then
    * probe. Production code calls [[fitIvf]] once per corpus and
    * [[probeIvf]] per query batch — this wrapper exists for the catalog
    * query, which must be a single expression over the test tables. */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 8, nProbe: Int = 2): DataFrame = {
    val dir = graft.io.TempDirs.createDeletedOnExit("graft_ivf_")
    val index = fitIvf(embeddings, nLists, dir.getAbsolutePath)
    probeIvf(embeddings.sparkSession, index, queries, k, nProbe)
  }

  /** Exact cosine-threshold pair join within `labelCol` blocks, skew-proof.
    *
    * Dense-vector threshold joins admit NO lossless prefilter when the
    * threshold sits in the tail of the random-similarity distribution — on
    * the test corpus (dim 64, max within-label cos 0.51, threshold 0.35) a
    * sign-LSH band scheme either keeps >85% of random pairs (no pruning) or
    * drops boundary pairs (per-bit collision p = 1 - acos(0.35)/π ≈ 0.61, so
    * any band length that prunes also misses) — measured, not guessed. Exact
    * semantics therefore cost O(block²) work; the 100 TB risk is not the
    * work, it's a hot label serializing it into ONE straggler task.
    *
    * This fans each label out to chunks² balanced tasks: every row gets a
    * hash chunk of its id; side a is replicated across all `cb` values,
    * side b across all `ca` values, and the equi-join on (label, ca, cb)
    * bounds per-task pairs at (block/chunks)². Each ordered row pair meets
    * in exactly one task, and `id_a < id_b` keeps one orientation.
    * Replication costs chunks× shuffle volume per side — the price of the
    * bound; pick chunks ≈ √(hot-block rows / target rows per task). For
    * genuinely high thresholds (true near-dups, cos ≥ 0.8) prefer
    * LSH/IVF candidates + exact verify ([[lshTopK]]/[[ivfTopK]]) instead —
    * there the band math works and the join goes near-linear.
    */
  def thresholdPairs(df: DataFrame, labelCol: String, idCol: String,
                     embCol: String, threshold: Double, chunks: Int = 8,
                     sim: (Column, Column) => Column): DataFrame = {
    require(chunks > 0, "chunks must be positive")
    val allChunks = array((0 until chunks).map(lit): _*)
    def chunkOf(c: Column): Column =
      pmod(crc32(c.cast("string")), lit(chunks)).cast("int")
    val a = df.select(col(labelCol).as("label"), col(idCol).as("id_a"),
        col(embCol).as("emb_a"), chunkOf(col(idCol)).as("ca"))
      .withColumn("cb", explode(allChunks))
    val b = df.select(col(labelCol).as("label"), col(idCol).as("id_b"),
        col(embCol).as("emb_b"), chunkOf(col(idCol)).as("cb"))
      .withColumn("ca", explode(allChunks))
    a.join(b, Seq("label", "ca", "cb"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", sim(col("emb_a"), col("emb_b")))
      .filter(col("cos") > threshold)
      .select(col("label"), col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF-PQ: the canonical billion-scale ANN layout (FAISS `IVFx,PQy`) —
    * IVF coarse pruning, PQ-code scoring inside the probed lists, exact
    * rerank of a short list. Three tiers, each cutting the work the next
    * tier sees:
    *
    *  1. **Coarse (IVF)**: queries probe `nProbe` of `nLists` inverted
    *     lists — corpus I/O drops ~nProbe/nLists via the partition-pruned
    *     index scan ([[probeIvf]]'s contract).
    *  2. **Cheap scoring (PQ / ADC)**: inside the probed lists, candidates
    *     score as cosine(raw query, DECODED code) — asymmetric distance
    *     against m-byte codes instead of dim-float vectors. At 100 TB the
    *     codes are what fits in memory; this tier exists so the raw
    *     vectors are touched only for...
    *  3. **Exact rerank**: the top `rerank` PQ-scored candidates per
    *     query join back to their raw embeddings (a broadcast of
    *     queries×rerank ids against the corpus — the Spark analogue of
    *     point lookups) and the final top-k is exact cosine.
    *
    * The codes are WRITTEN into the inverted-list layout at index-build
    * time ([[fitIvfPq]]): the encode pass (m·ks interpreted HOF distance
    * loops per row — the expensive half of PQ) runs ONCE per corpus, and
    * every probe reads m-byte codes and pays only the single decode
    * lookup per candidate (measured: read-time encoding cost 2.8 s per
    * probe on the sf0.1 corpus vs 0.8 s against the coded layout). Ties
    * break on (score desc, id asc) at both tiers — deterministic end to
    * end. Fit-once/probe-many: both halves of the index are
    * corpus-lifecycle artifacts; this probe entry point serves any number
    * of query batches against them. */
  def probeIvfPq(embeddings: DataFrame, queries: DataFrame, k: Int,
                 index: IvfIndex, cb: ProductQuantizer.PqCodebook,
                 nProbe: Int = 2, rerank: Int = 12): DataFrame = {
    import org.apache.spark.sql.graft.CosineSimilarity.cosine_sim
    val spark = embeddings.sparkSession
    val corpus = spark.read.parquet(index.path)
      .select(col("vec_id").as("neighbor_id"),
        ProductQuantizer.decodeExpr(col("codes"), cb).as("d_emb"),
        col("list_id"))
    def centroidLit(i: Int): Column =
      array(index.centroids(i).toIndexedSeq.map(v => lit(v)): _*)
    val probeSims = array((0 until index.nLists).map { i =>
      struct(lit(i).as("list_id"), cosine_sim(col("q_emb"), centroidLit(i)).as("csim"))
    }: _*)
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("p.csim").desc, col("p.list_id").asc)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .select(col("query_id"), col("q_emb"), explode(probeSims).as("p"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("p.list_id").as("list_id"))
    // tier 2: ADC scoring over codes in the probed lists only
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("neighbor_id").asc)
    val shortlist = corpus.join(broadcast(probes), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", cosine_sim(col("q_emb"), col("d_emb")))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= rerank)
      .select(col("query_id"), col("q_emb"), col("neighbor_id"))
    // tier 3: exact rerank of the short list against raw embeddings
    val scored = embeddings
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .withColumn("cos", cosine_sim(col("q_emb"), col("c_emb")))
    rankTopK(scored, k)
  }

  /** Build the full IVF-PQ index: coarse quantizer + PQ codebooks fit on
    * the corpus, then the coded inverted-list layout written to
    * `indexDir` — (vec_id, codes, list_id) partitioned by list_id, so
    * probes both partition-prune AND read 8-byte codes instead of
    * 256-byte vectors. The encode pass runs here, once per corpus. */
  def fitIvfPq(embeddings: DataFrame, nLists: Int, m: Int, ks: Int,
               dim: Int, indexDir: String, seed: Long = 42)
      : (IvfIndex, ProductQuantizer.PqCodebook) = {
    val coarse = fitIvf(embeddings, nLists, s"$indexDir/coarse", seed)
    val cb = ProductQuantizer.fit(embeddings, "vec_id", "embedding",
      dim = dim, m = m, ks = ks)
    val coded = s"$indexDir/coded"
    embeddings.sparkSession.read.parquet(coarse.path)
      .select(col("vec_id"),
        ProductQuantizer.encodeExpr(col("embedding"), cb).as("codes"),
        col("list_id"))
      .write.partitionBy("list_id")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(coded)
    // both artifact halves ride as sidecars: coarse centroids were
    // stamped into coded's dir too (loadIvfPq reopens from one root),
    // and the codebook lands beside the codes it decodes
    graft.io.SketchStore.saveIvfCentroids(embeddings.sparkSession, coded,
      coarse.centroids)
    graft.io.SketchStore.savePqCodebook(embeddings.sparkSession, coded, cb)
    (IvfIndex(coded, coarse.centroids), cb)
  }

  /** Reopen a [[fitIvfPq]] index from its root directory — centroids and
    * codebook from the coded dir's sidecars, bit-exact, probe-identical
    * across a JVM restart (SketchStoreSpec). */
  def loadIvfPq(spark: org.apache.spark.sql.SparkSession, indexDir: String)
      : (IvfIndex, ProductQuantizer.PqCodebook) = {
    val coded = s"$indexDir/coded"
    (IvfIndex(coded, graft.io.SketchStore.loadIvfCentroids(spark, coded)),
      graft.io.SketchStore.loadPqCodebook(spark, coded))
  }

  /** Density-aware ADC shortlist length for [[probeIvfPq]] — the dial
    * the recall ladder proved must scale with the corpus: a FIXED rerank
    * collapses as density grows (measured recall@3 at rerank = 32:
    * 0.16 at sf1 → 0.08 at sf10 — more candidates with similar coded
    * scores crowd the true neighbors out of a fixed-length shortlist),
    * while a shortlist that is a fixed FRACTION of the probed candidates
    * holds and even rises with density (candidates/32: 0.33 at sf1 →
    * 0.42 at sf10, against the nProbe-coverage ceiling of ~0.53 —
    * RecallLadderSpec asserts the sf1 floor, SCALE.md records the
    * curve). Cost stays proportional to the probe volume the coarse
    * level already pays, so the exact-rerank tier remains the cheap
    * tail of the pipeline. */
  def adcRerank(corpusRows: Long, nLists: Int, nProbe: Int,
                shortlistFraction: Int = 32, floor: Int = 32): Int =
    math.max(floor,
      (corpusRows * nProbe / nLists / shortlistFraction).toInt)

  /** Self-contained IVF-PQ demo: fit both index halves to a fresh temp
    * dir, then probe — the [[ivfTopK]] analogue for tests and one-shot
    * use. Production fits once per corpus and calls [[probeIvfPq]]. */
  def ivfPqTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
                nLists: Int = 8, nProbe: Int = 2,
                m: Int = 8, ks: Int = 16, dim: Int = 64,
                rerank: Int = 12): DataFrame = {
    val dir = graft.io.TempDirs.createDeletedOnExit("graft_ivfpq_")
    val (index, cb) = fitIvfPq(embeddings, nLists, m, ks, dim,
      dir.getAbsolutePath)
    probeIvfPq(embeddings, queries, k, index, cb, nProbe, rerank)
  }

  /** Approximate top-k: neighbors restricted to the query's LSH bucket,
    * optionally MULTI-PROBED.
    *
    * `hammingRadius = 0` probes only the query's own bucket — the classic
    * single-probe shape, whose recall on near-isotropic embeddings is
    * provably poor: a true neighbor at angle θ lands in the same bucket
    * with probability (1 − θ/π)^bits, ≈ 0.13 for θ ≈ 66° at bits = 4
    * (measured 0.11 recall@3 on the driver's real embeddings table —
    * RecallFloorSpec). `hammingRadius = 1` additionally probes the `bits`
    * buckets whose signature differs by one flipped hyperplane — the
    * standard multi-probe LSH trade (Lv et al., VLDB'07): the flipped-bit
    * buckets are exactly where a near-miss neighbor lands, so recall
    * multiplies (measured 0.11 → 0.43 at bits = 4) for a bounded
    * (bits + 1)× growth in probed candidates. At scale this stays a
    * broadcast of (queries × probes) tiny rows against the bucketed
    * corpus — no corpus-side blowup, no extra shuffle of the big side. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, dim: Int, k: Int,
              bits: Int = 8, hammingRadius: Int = 0): DataFrame = {
    require(hammingRadius >= 0 && hammingRadius <= 1,
      s"hammingRadius $hammingRadius unsupported (0 or 1)")
    val norm = sqrt(sqNorm(col("embedding")))
    val all = lshBuckets(embeddings, dim, bits)
    val probed = {
      val base = lshBuckets(queries, dim, bits)
      if (hammingRadius == 0) base
      else base.withColumn("bucket",
        explode(array((col("bucket") +:
          (0 until bits).map(b => col("bucket").bitwiseXOR(lit(1L << b)))): _*)))
    }
    val q = probed
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        norm.as("q_norm"), col("bucket"))
    val scored = all.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        norm.as("c_norm"), col("bucket"))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // zero-norm guard, same rule as the native cosine_sim: unguarded,
      // a zero vector scores NaN and ranks FIRST under desc in Spark
      // while DuckDB's NULL ranks last — divergent top-k (round-13
      // review catch; latent on the catalog's gaussian embeddings)
      .withColumn("cos",
        when(col("q_norm") === 0 || col("c_norm") === 0, lit(0.0))
          .otherwise(dot(col("q_emb"), col("c_emb"))
            / (col("q_norm") * col("c_norm"))))
    rankTopK(scored, k)
  }

  // ------------------------------------------------------------------
  // Generated DuckDB oracles — the verify-replay upgrade for the ANN
  // tier. The non-SQL-expressible artifacts (seeded hyperplanes, fitted
  // centroids, PQ codebooks) enter as literals; EVERYTHING downstream —
  // sign bits, multi-probe expansion, euclidean list assignment, probe
  // selection, ADC scoring, rerank, final top-k — is independently
  // recomputed by DuckDB with bit-identical folds (see SqlReplay's
  // scaladoc for why the doubles, and hence the ranks, cannot diverge).
  // A banding bug, a wrong list assignment, a dropped candidate, or a
  // broken tie rule all hash-mismatch.
  // ------------------------------------------------------------------
  import SqlReplay.{dArr, dot => sqlDot, sq => sqlSq, sqDiff, cosGuarded}

  /** STATIC DuckDB oracle for [[lshTopK]] — static because the planes are
    * a pure function of (dim, bits, seed): the oracle regenerates them
    * with the same RNG and replays bucket bits, the Hamming-radius-1
    * multi-probe expansion, the bucket join, and the exact cosine top-k.
    * `queryPred` is the query-set filter over `embeddings` (e.g.
    * `vec_id < 50`). */
  def lshAnnOracleSql(dim: Int, bits: Int, k: Int, queryPred: String,
                      hammingRadius: Int = 1, seed: Long = 42): String = {
    require(hammingRadius >= 0 && hammingRadius <= 1,
      s"hammingRadius $hammingRadius unsupported (0 or 1)")
    val planes = lshPlanes(dim, bits, seed)
    val pl = s"CAST([${planes.map(dArr).mkString(", ")}] AS DOUBLE[][])"
    val bitTerm = (0 until bits).map { b =>
      s"(CASE WHEN ${sqlDot("e.emb", s"pl.ps[${b + 1}]")} >= 0 " +
        s"THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    val probeList = ("bucket" +: (if (hammingRadius == 0) Seq.empty
      else (0 until bits).map(b => s"xor(bucket, ${1L << b})"))).mkString(", ")
    s"""WITH pl AS (SELECT $pl AS ps),
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       bkt AS (SELECT e.vec_id, e.emb, sqrt(${sqlSq("e.emb")}) AS n,
           CAST($bitTerm AS BIGINT) AS bucket
         FROM e CROSS JOIN pl),
       pq AS (SELECT vec_id AS query_id, emb AS q_emb, n AS q_n,
           unnest([$probeList]) AS bucket
         FROM bkt WHERE $queryPred),
       scored AS (SELECT p.query_id, c.vec_id AS neighbor_id,
           ${cosGuarded("p.q_emb", "c.emb", "p.q_n", "c.n")} AS cos
         FROM pq p JOIN bkt c ON c.bucket = p.bucket AND c.vec_id <> p.query_id)
       SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk,
         neighbor_id
       FROM scored QUALIFY rnk <= $k ORDER BY query_id, rnk"""
  }

  /** The shared cents/e/asg/probes CTE block of the IVF-family replays:
    * recorded (float-rounded) centroids as literals, euclidean argmin
    * list assignment (ties to the smallest list — [[fitIvf]]'s fold), and
    * per-query nProbe probe-list selection by centroid cosine (csim DESC,
    * list ASC — [[probeIvf]]'s window). ONE derivation consumed by both
    * [[ivfAnnOracleSql]] and [[ivfPqAnnOracleSql]]. */
  private def ivfCtes(centroids: Array[Array[Float]], nProbe: Int,
                      queryPred: String): String = {
    val rows = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, CAST(${dArr(c.map(_.toDouble))} AS DOUBLE[]))"
    }.mkString(", ")
    s"""cents0(list_id, cent) AS (VALUES $rows),
       cents AS (SELECT list_id, cent, sqrt(${sqlSq("cent")}) AS cn FROM cents0),
       e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       e AS (SELECT vec_id, emb, sqrt(${sqlSq("emb")}) AS n FROM e0),
       dist AS (SELECT e.vec_id, c.list_id, ${sqDiff("e.emb", "c.cent")} AS d
         FROM e CROSS JOIN cents c),
       asg AS (SELECT vec_id, list_id FROM (
           SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id
             ORDER BY d ASC, list_id ASC) AS rn FROM dist) t WHERE rn = 1),
       q AS (SELECT vec_id AS query_id, emb AS q_emb, n AS q_n FROM e
         WHERE $queryPred),
       psim AS (SELECT q.query_id, q.q_emb, q.q_n, c.list_id,
           ${cosGuarded("q.q_emb", "c.cent", "q.q_n", "c.cn")} AS csim
         FROM q CROSS JOIN cents c),
       probes AS (SELECT query_id, q_emb, q_n, list_id FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY csim DESC, list_id ASC) AS prn FROM psim) t
         WHERE prn <= $nProbe)"""
  }

  /** GENERATED DuckDB oracle for [[probeIvf]] over a [[fitIvf]] index:
    * the recorded centroids replay the whole index (assignment is a pure
    * function of corpus + centroids since the fold-based fitIvf), then
    * probe selection and the exact cosine top-k within the probed lists. */
  def ivfAnnOracleSql(centroids: Array[Array[Float]], nProbe: Int, k: Int,
                      queryPred: String): String =
    s"""WITH ${ivfCtes(centroids, nProbe, queryPred)},
       scored AS (SELECT p.query_id, ce.vec_id AS neighbor_id,
           ${cosGuarded("p.q_emb", "ce.emb", "p.q_n", "ce.n")} AS cos
         FROM probes p JOIN asg a ON a.list_id = p.list_id
         JOIN e ce ON ce.vec_id = a.vec_id
         WHERE ce.vec_id <> p.query_id)
       SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk, neighbor_id
       FROM scored QUALIFY rnk <= $k ORDER BY query_id, rnk"""

  /** GENERATED DuckDB oracle for [[probeIvfPq]] over a [[fitIvfPq]]
    * index: coarse centroids + PQ codebooks as literals, then DuckDB
    * independently replays all three tiers — list assignment, PQ encode
    * (argmin per subspace, ties to the lowest code) + decode, ADC scoring
    * and the rerank shortlist, and the exact final top-k against raw
    * embeddings. */
  def ivfPqAnnOracleSql(centroids: Array[Array[Float]],
                        cb: ProductQuantizer.PqCodebook,
                        nProbe: Int, rerank: Int, k: Int,
                        queryPred: String): String =
    s"""WITH ${ivfCtes(centroids, nProbe, queryPred)},
       cbv AS (SELECT ${ProductQuantizer.codebookLit(cb)} AS cbl),
       codes AS (SELECT e.vec_id,
           ${ProductQuantizer.codesSql("e.emb", "cbv.cbl", cb)} AS cds
         FROM e, cbv),
       dec AS (SELECT c.vec_id,
           ${ProductQuantizer.decodeSql("c.cds", "cbv.cbl", cb.m)} AS demb
         FROM codes c, cbv),
       decn AS (SELECT vec_id, demb, sqrt(${sqlSq("demb")}) AS dn FROM dec),
       adc AS (SELECT p.query_id, p.q_emb, p.q_n, d.vec_id AS neighbor_id,
           ${cosGuarded("p.q_emb", "d.demb", "p.q_n", "d.dn")} AS adc
         FROM probes p JOIN asg a ON a.list_id = p.list_id
         JOIN decn d ON d.vec_id = a.vec_id
         WHERE d.vec_id <> p.query_id),
       short AS (SELECT query_id, q_emb, q_n, neighbor_id FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY adc DESC, neighbor_id ASC) AS arn FROM adc) t
         WHERE arn <= $rerank),
       scored AS (SELECT s.query_id, s.neighbor_id,
           ${cosGuarded("s.q_emb", "ce.emb", "s.q_n", "ce.n")} AS cos
         FROM short s JOIN e ce ON ce.vec_id = s.neighbor_id)
       SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk, neighbor_id
       FROM scored QUALIFY rnk <= $k ORDER BY query_id, rnk"""
}
