package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-principal-component fit by POWER ITERATION over the covariance
  * matrix — the embedding-pipeline preprocessing step (decorrelation /
  * whitening before ANN indexing, OPQ-style rotation fitting, drift
  * monitoring of an embedding column) that needs exactly one distributed
  * pass regardless of corpus size.
  *
  * Scale shape: the ONLY corpus-sized work is one `treeAggregate` that
  * accumulates, per partition, the d×d raw second-moment matrix, the
  * d-vector of sums, and the row count (the public RowMatrix
  * `computeGramianMatrix` pattern — per-partition imperative accumulation
  * is the one job DataFrame aggregates cannot express without a d²-row
  * explode per input row). Each partition ships d² + d + 1 doubles
  * (d = 64 → ~33 KB) up a tree of depth 2 — corpus-independent driver
  * load. Everything after — covariance from moments, the power loop, the
  * eigenvalue — is O(d² · iters) DRIVER arithmetic on a 64×64, and the
  * projection pass back over the corpus is a map-side fold against two
  * broadcast-literal d-vectors. Nothing shuffles at any scale.
  *
  * Determinism: the fit is recorded (the q_embed_kmeans centroid-memo
  * lifecycle), and everything DOWNSTREAM of the recorded (μ, v) literals
  * is a fixed sequential IEEE fold replayed bit-identically by the oracle
  * ([[SqlReplay]]'s argument); the fold is quantized to integer micro
  * units at emission, so even the ±0.0 fold-seed corner cannot surface.
  * The fit itself combines partition partials in scheduler order — stable
  * within a recording, which is all the replay needs.
  */
object Pca {

  /** Fitted first principal component of an embedding column. */
  final case class PcaModel(mu: Array[Double], v: Array[Double],
                            lambda: Double, totalVar: Double, n: Long) {
    /** Share of total variance explained by the component, in ppm. */
    def explainedPpm: Long =
      if (totalVar <= 0d) 0L else math.floor(lambda / totalVar * 1e6).toLong
  }

  /** One-pass moment accumulation + driver-side power iteration.
    *
    * `iters = 96` is a fixed horizon, not a convergence knob: power
    * iteration converges linearly at rate λ₂/λ₁ per step, so 96 steps
    * resolve any spectral gap above ~1.2× to far below the micro-unit
    * quantization the consumers emit at; a near-degenerate top pair
    * (λ₂≈λ₁) has no distinguished first component for ANY solver, and the
    * recorded-literal oracle replays whichever representative the fit
    * landed on — correctness never depends on the horizon. */
  def fit(df: DataFrame, embCol: String, dim: Int, iters: Int = 96): PcaModel = {
    val d = dim
    // (raw second moments, element sums, count) — one corpus pass.
    val (s2, s1, n) = df.select(col(embCol)).rdd
      .treeAggregate((new Array[Double](d * d), new Array[Double](d), 0L))(
        seqOp = { case ((m, s, c), row) =>
          val x = row.getSeq[Float](0)
          require(x.length == d, s"embedding length ${x.length} != dim $d")
          var i = 0
          while (i < d) {
            val xi = x(i).toDouble
            s(i) += xi
            var j = 0
            while (j < d) { m(i * d + j) += xi * x(j).toDouble; j += 1 }
            i += 1
          }
          (m, s, c + 1L)
        },
        combOp = { case ((m1, s1a, c1), (m2, s2a, c2)) =>
          var i = 0
          while (i < d * d) { m1(i) += m2(i); i += 1 }
          i = 0
          while (i < d) { s1a(i) += s2a(i); i += 1 }
          (m1, s1a, c1 + c2)
        })
    require(n > 0, "PCA fit over an empty embedding column")
    val mu = Array.tabulate(d)(i => s1(i) / n)
    // covariance C = S2/n − μμᵀ (population normalization; the component
    // direction is invariant to the 1/n vs 1/(n−1) choice)
    val cov = Array.tabulate(d * d)(k => s2(k) / n - mu(k / d) * mu(k % d))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i * d + j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0d, "power iteration collapsed to the zero vector")
      v = w.map(_ / nrm)
      it += 1
    }
    // sign convention: the largest-|component| coordinate is positive, so
    // the recorded direction is reproducible across fits
    val m = v.indices.maxBy(i => math.abs(v(i)))
    if (v(m) < 0d) v = v.map(x => -x)
    val lambda = {
      var acc = 0.0
      var i = 0
      while (i < d) {
        var rowAcc = 0.0
        var j = 0
        while (j < d) { rowAcc += cov(i * d + j) * v(j); j += 1 }
        acc += v(i) * rowAcc
        i += 1
      }
      acc
    }
    val trace = (0 until d).map(i => cov(i * d + i)).sum
    PcaModel(mu, v, lambda, trace, n)
  }

  /** Per-row projection onto the component: a SEQUENTIAL fold of
    * `(x_i − μ_i) · v_i` (float→double widening exact, each op correctly
    * rounded, left-to-right), quantized to integer micro units. The fold
    * shape is what [[projectionOracleSql]] replays bit-identically. */
  def projectionMicro(emb: Column, m: PcaModel): Column = {
    val d = m.mu.length
    val terms = transform(sequence(lit(1), lit(d)), i =>
      (element_at(emb, i).cast("double") -
        element_at(typedLit(m.mu.toSeq), i)) *
        element_at(typedLit(m.v.toSeq), i))
    floor(aggregate(terms, lit(0.0d), (acc, x) => acc + x) * 1000000d + 0.5d)
      .cast("long")
  }

  /** DuckDB replay of [[projectionMicro]] over `embeddings` from the
    * recorded (μ, v) literals — the same sequential fold ([[SqlReplay]]'s
    * bit-identity argument), the same micro quantization. */
  def projectionOracleSql(m: PcaModel): String = {
    val muL = SqlReplay.dArr(m.mu)
    val vL = SqlReplay.dArr(m.v)
    val fold = s"list_reduce(list_transform(range(1, len(embedding) + 1), " +
      s"i -> (CAST(embedding[i] AS DOUBLE) - ($muL)[i]) * ($vL)[i]), " +
      s"(acc, x) -> acc + x)"
    s"""SELECT vec_id, label,
       CAST(floor($fold * 1000000 + 0.5) AS BIGINT) AS proj_micro
       FROM embeddings ORDER BY vec_id"""
  }
}
