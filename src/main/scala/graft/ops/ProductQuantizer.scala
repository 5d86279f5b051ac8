package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011 — the FAISS `PQx`
  * building block): compress a dim-D float embedding into `m` small
  * codes by splitting it into m subvectors and vector-quantizing each
  * against its own ks-entry codebook. At dim 64 / m 8 / ks 16 that is
  * 256 bytes of floats → 8 codes (one byte each at ks ≤ 256): a 32×
  * compression that makes corpus-scale similarity work feasible — at
  * 100 TB of raw embeddings the PQ codes fit in ~3 TB, close enough to
  * memory-resident for the verify/rerank tiers that raw vectors are not.
  *
  * Scale shape:
  *  - **Fit on a bounded sample, once per corpus.** PQ codebooks are
  *    always trained on a sample (the FAISS recipe); the sample is taken
  *    by hash-ordered top-k (`TakeOrdered` — k rows per partition then a
  *    k-merge, never a global sort) and Lloyd's runs on the DRIVER over
  *    ≤ sampleN rows — the same bounded-driver-state contract as IVF
  *    centroids. Deterministic: seeded first center, then farthest-point
  *    init (no RNG, immune to the duplicate-center collapse that bites
  *    row-sampled init on duplicate-heavy data), ties to the lowest
  *    index.
  *  - **Encode/decode are map-side Column expressions** — codebooks ship
  *    as literals inside the plan like IVF's centroids; no shuffle, no
  *    UDF serialization boundary, embarrassingly parallel over the
  *    corpus.
  *  - **Search** runs over decoded (reconstructed) vectors — the
  *    symmetric-distance flavor; candidates from any blocking (IVF
  *    lists, LSH buckets) rerank against raw vectors only for the final
  *    short list.
  */
object ProductQuantizer {

  /** Fitted codebooks: `centroids(mi)(j)` is the dim/m-length centroid
    * for code j of subspace mi. Driver-tiny (m·ks·subDim floats). */
  final case class PqCodebook(m: Int, ks: Int, subDim: Int,
                              centroids: Array[Array[Array[Float]]]) {
    def dim: Int = m * subDim
  }

  /** Train per-subspace codebooks on a deterministic hash-ordered sample
    * of ≤ `sampleN` rows. `dim` must split evenly into `m` subspaces. */
  def fit(embeddings: DataFrame, idCol: String, embCol: String,
          dim: Int, m: Int, ks: Int, sampleN: Int = 1024,
          iters: Int = 5): PqCodebook = {
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    require(ks >= 1 && sampleN >= ks, s"need sampleN >= ks, got $sampleN < $ks")
    val subDim = dim / m
    val sample: Array[Array[Float]] = embeddings
      .select(col(embCol).cast("array<float>").as("e"),
        xxhash64(col(idCol)).as("h"))
      .orderBy("h")
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot fit PQ on an empty corpus")
    require(sample.head.length == dim,
      s"embedding dim ${sample.head.length} != declared dim $dim")
    val centroids = Array.tabulate(m) { mi =>
      val subs = sample.map(v => v.slice(mi * subDim, (mi + 1) * subDim))
      lloyd(subs, ks, iters)
    }
    PqCodebook(m, ks, subDim, centroids)
  }

  /** Driver-side Lloyd's over the (bounded) sample. Farthest-point init:
    * center 0 is the first sample row (the hash order already randomizes
    * it), each next center the point maximizing min-distance to the
    * chosen set — deterministic, well-spread, never a duplicate while
    * distinct points remain. Empty clusters keep their previous center. */
  private def lloyd(pts: Array[Array[Float]], ks: Int, iters: Int): Array[Array[Float]] = {
    val n = pts.length
    val d = pts(0).length
    def dist2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val centers = Array.ofDim[Array[Float]](ks)
    centers(0) = pts(0).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    for (c <- 1 until ks) {
      var best = 0; var bestD = -1.0
      var i = 0
      while (i < n) {
        val dd = math.min(minD(i), dist2(pts(i), centers(c - 1)))
        minD(i) = dd
        if (dd > bestD) { bestD = dd; best = i }
        i += 1
      }
      centers(c) = pts(best).clone()
    }
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Double](ks, d)
      val counts = Array.ofDim[Int](ks)
      var i = 0
      while (i < n) {
        var bj = 0; var bd = Double.MaxValue
        var j = 0
        while (j < ks) {
          val dd = dist2(pts(i), centers(j))
          if (dd < bd) { bd = dd; bj = j }
          j += 1
        }
        counts(bj) += 1
        var k = 0
        while (k < d) { sums(bj)(k) += pts(i)(k); k += 1 }
        i += 1
      }
      for (j <- 0 until ks if counts(j) > 0; k <- 0 until d)
        centers(j)(k) = (sums(j)(k) / counts(j)).toFloat
    }
    centers
  }

  /** Encoding expression: `array<int>` of m codes, each the argmin-L2
    * centroid of its subspace (ties to the lowest code — array_sort on
    * (distance, code) structs). Pure Column arithmetic over codebook
    * literals; map-side at any scale. */
  def encodeExpr(emb: Column, cb: PqCodebook): Column = {
    val e = emb.cast("array<double>")
    val codes = (0 until cb.m).map { mi =>
      val sub = slice(e, mi * cb.subDim + 1, cb.subDim)
      val cands = array((0 until cb.ks).map { j =>
        val cent = array(cb.centroids(mi)(j).toIndexedSeq.map(v => lit(v.toDouble)): _*)
        struct(
          aggregate(zip_with(sub, cent, (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, v) => a + v).as("d"),
          lit(j).as("j"))
      }: _*)
      array_sort(cands).getItem(0).getField("j")
    }
    array(codes: _*)
  }

  /** Decoding (reconstruction) expression: concatenate each code's
    * centroid — `array<double>` of the original dimension. */
  def decodeExpr(codes: Column, cb: PqCodebook): Column = {
    val cbLit = array((0 until cb.m).map(mi =>
      array((0 until cb.ks).map(j =>
        array(cb.centroids(mi)(j).toIndexedSeq.map(v => lit(v.toDouble)): _*)): _*)): _*)
    flatten(transform(sequence(lit(0), lit(cb.m - 1)),
      mi => element_at(element_at(cbLit, mi + 1), element_at(codes, mi + 1) + 1)))
  }

  // ------------------------------------------------------------------
  // DuckDB replay — the SQL twins of encodeExpr/decodeExpr, consumed by
  // the generated PQ / IVF-PQ oracles. The codebook enters as a literal;
  // encode's per-subspace distance is the same sequential fold (see
  // SqlReplay), and the argmin replays array_sort's lexicographic
  // (d, j) rule via list_sort over the same structs — ties to the
  // lowest code on both engines.
  // ------------------------------------------------------------------

  /** The fitted codebook as a DOUBLE[][][] literal — exactly the values
    * `encodeExpr`/`decodeExpr` ship as Column literals (float centroids
    * widened to double, which is exact). */
  def codebookLit(cb: PqCodebook): String =
    "CAST([" + cb.centroids.map(sub =>
      "[" + sub.map(c => SqlReplay.dArr(c.map(_.toDouble))).mkString(", ") + "]")
      .mkString(", ") + "] AS DOUBLE[][][])"

  /** SQL twin of [[encodeExpr]] over `emb` (a DOUBLE[] expr) against the
    * codebook literal bound to `cbl`: m codes, each the argmin-L2 entry
    * of its subspace. Subvector element i of subspace mi is read in place
    * as `emb[mi·subDim + i]` — the same elements `slice` feeds zip_with. */
  def codesSql(emb: String, cbl: String, cb: PqCodebook): String = {
    val sd = cb.subDim
    val diff = s"($emb[mi * $sd + i] - $cbl[mi + 1][j + 1][i])"
    s"list_transform(range(0, ${cb.m}), mi -> " +
      s"list_sort(list_transform(range(0, ${cb.ks}), j -> " +
      s"{'d': list_reduce(list_transform(range(1, $sd + 1), " +
      s"i -> $diff * $diff), (acc, x) -> acc + x), 'j': j}))[1].j)"
  }

  /** SQL twin of [[decodeExpr]]: concatenate each code's centroid. */
  def decodeSql(codes: String, cbl: String, m: Int): String =
    s"flatten(list_transform(range(1, $m + 1), mi -> $cbl[mi][$codes[mi] + 1]))"

  /** GENERATED DuckDB oracle for the PQ reconstruction-stats query
    * (`q_embed_pq`): encode + decode replayed from the codebook literal,
    * reconstruction cosine floor-quantized to integer micro-units PER ROW
    * before the label sums — exact long arithmetic on both engines, no
    * summation-order-dependent double aggregates. */
  def reconStatsOracleSql(cb: PqCodebook): String = {
    import SqlReplay.{dot, sq}
    s"""WITH cbv AS (SELECT ${codebookLit(cb)} AS cbl),
       e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
             FROM embeddings),
       codes AS (SELECT e.vec_id, ${codesSql("e.emb", "cbv.cbl", cb)} AS cds
         FROM e, cbv),
       dec AS (SELECT c.vec_id, ${decodeSql("c.cds", "cbv.cbl", cb.m)} AS demb
         FROM codes c, cbv),
       rc AS (SELECT e.label,
           CAST(floor(${dot("e.emb", "d.demb")}
             / (sqrt(${sq("e.emb")}) * sqrt(${sq("d.demb")}))
             * 1000000.0) AS BIGINT) AS rcm
         FROM dec d JOIN e ON e.vec_id = d.vec_id)
       SELECT label, count(*) AS n_vecs,
         CAST(sum(rcm) AS BIGINT) AS sum_recon_cos_micro,
         min(rcm) AS min_recon_cos_micro
       FROM rc GROUP BY label ORDER BY label"""
  }
}
