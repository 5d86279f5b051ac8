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

  /** Fitted top-k component basis: `vs(j)` is the j-th eigenvector
    * (eigenvalues descending), orthonormal (Gram–Schmidt; property-tested
    * in PcaKSpec). */
  final case class PcaKModel(mu: Array[Double], vs: Array[Array[Double]],
                             lambdas: Array[Double], totalVar: Double,
                             n: Long) {
    def k: Int = vs.length
    /** Share of total variance explained by the basis, in ppm. */
    def explainedPpm: Long =
      if (totalVar <= 0d) 0L
      else math.floor(lambdas.sum / totalVar * 1e6).toLong
  }

  /** The one corpus-sized job both fits share: (covariance, mean, trace,
    * count) from a single tree-aggregated moment pass. */
  private def moments(df: DataFrame, embCol: String, dim: Int)
      : (Array[Double], Array[Double], Double, Long) = {
    val d = dim
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
    // directions are invariant to the 1/n vs 1/(n−1) choice)
    val cov = Array.tabulate(d * d)(k => s2(k) / n - mu(k / d) * mu(k % d))
    val trace = (0 until d).map(i => cov(i * d + i)).sum
    (cov, mu, trace, n)
  }

  private def matVec(cov: Array[Double], v: Array[Double]): Array[Double] = {
    val d = v.length
    val w = new Array[Double](d)
    var i = 0
    while (i < d) {
      var acc = 0.0
      var j = 0
      while (j < d) { acc += cov(i * d + j) * v(j); j += 1 }
      w(i) = acc
      i += 1
    }
    w
  }

  private def quadForm(cov: Array[Double], v: Array[Double]): Double = {
    val w = matVec(cov, v)
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i) * w(i); i += 1 }
    acc
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
    val (cov, mu, trace, n) = moments(df, embCol, dim)
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = matVec(cov, v)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0d, "power iteration collapsed to the zero vector")
      v = w.map(_ / nrm)
      it += 1
    }
    // sign convention: the largest-|component| coordinate is positive, so
    // the recorded direction is reproducible across fits
    val m = v.indices.maxBy(i => math.abs(v(i)))
    if (v(m) < 0d) v = v.map(x => -x)
    PcaModel(mu, v, quadForm(cov, v), trace, n)
  }

  /** Top-k component fit by ORTHOGONAL ITERATION (the power loop
    * generalized: W = C·V, then re-orthonormalize by modified
    * Gram–Schmidt each step — subspace iteration converges to the
    * dominant k-dimensional invariant subspace at rate λ_{k+1}/λ_k, and
    * the per-column ordering within it at the neighboring-gap rates).
    * Same scale shape as [[fit]]: the corpus pays ONE tree-aggregated
    * moment pass; the iteration is O(d²·k·iters) driver arithmetic.
    *
    * Determinism: a fixed quasi-random init (no RNG — `Date.now`-free
    * like everything here), fixed op order in the Gram–Schmidt, the
    * [[fit]] sign convention per column, and columns emitted in
    * eigenvalue-descending order. As with [[fit]], the recorded (μ, V)
    * is what the oracle replays, so scheduler-order float noise in the
    * moment combine cannot surface. */
  def fitK(df: DataFrame, embCol: String, dim: Int, k: Int,
           iters: Int = 96): PcaKModel = {
    val d = dim
    require(k >= 1 && k <= d, s"k=$k out of range [1, $d]")
    val (cov, mu, trace, n) = moments(df, embCol, dim)
    // deterministic non-degenerate init, then one QR to start orthonormal.
    // The entries are a Knuth-hash mix of (i, j) — NOT an affine formula:
    // anything linear in (i, j) makes the column differences constant
    // vectors (rank ≤ 2 regardless of k), which collapses Gram–Schmidt
    // the moment the corpus projects them onto a low-rank eigenspace.
    var vs = Array.tabulate(k) { j =>
      Array.tabulate(d) { i =>
        val x = i.toLong * 2654435761L + j.toLong * 40503L + 12345L
        (((x ^ (x >>> 16)) & 0x3ff) + 1).toDouble
      }
    }
    def gramSchmidt(m: Array[Array[Double]]): Array[Array[Double]] = {
      val out = new Array[Array[Double]](m.length)
      var j = 0
      while (j < m.length) {
        val w = m(j).clone()
        var p = 0
        while (p < j) {
          val q = out(p)
          var dotpw = 0.0
          var i = 0
          while (i < d) { dotpw += q(i) * w(i); i += 1 }
          i = 0
          while (i < d) { w(i) -= dotpw * q(i); i += 1 }
          p += 1
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        require(nrm > 1e-12,
          s"orthogonal iteration column $j collapsed — corpus rank < k?")
        out(j) = w.map(_ / nrm)
        j += 1
      }
      out
    }
    vs = gramSchmidt(vs)
    var it = 0
    while (it < iters) {
      vs = gramSchmidt(vs.map(v => matVec(cov, v)))
      it += 1
    }
    // eigenvalue-descending column order (orthogonal iteration converges
    // that way; the explicit sort makes ties and finite-iters honest),
    // then the per-column sign convention
    val ordered = vs.map(v => (quadForm(cov, v), v))
      .sortBy { case (l, _) => -l }
    val signed = ordered.map { case (l, v0) =>
      val m = v0.indices.maxBy(i => math.abs(v0(i)))
      (l, if (v0(m) < 0d) v0.map(x => -x) else v0)
    }
    PcaKModel(mu, signed.map(_._2), signed.map(_._1), trace, n)
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

  private def foldCol(emb: Column, mu: Seq[Double], v: Seq[Double]): Column = {
    val d = mu.length
    val terms = transform(sequence(lit(1), lit(d)), i =>
      (element_at(emb, i).cast("double") -
        element_at(typedLit(mu), i)) *
        element_at(typedLit(v), i))
    aggregate(terms, lit(0.0d), (acc, x) => acc + x)
  }

  /** Projection onto component `j` of a [[fitK]] basis, micro-quantized —
    * the [[projectionMicro]] fold against column j. */
  def projectionKMicro(emb: Column, m: PcaKModel, j: Int): Column =
    floor(foldCol(emb, m.mu.toSeq, m.vs(j).toSeq) * 1000000d + 0.5d)
      .cast("long")

  /** WHITENED coordinate j: the projection scaled by 1/√λ_j, so the
    * transformed corpus has unit variance along every kept axis — the
    * standard pre-ANN / pre-OPQ normalization. √λ_j is computed ONCE on
    * the driver and embedded as the identical double literal in both
    * engines (Double.toString round-trips), so the scale is one
    * correctly-rounded division each side — bit-identical. */
  def whitenedKMicro(emb: Column, m: PcaKModel, j: Int): Column = {
    require(m.lambdas(j) > 0d, s"component $j has non-positive variance")
    floor(foldCol(emb, m.mu.toSeq, m.vs(j).toSeq) / math.sqrt(m.lambdas(j))
      * 1000000d + 0.5d).cast("long")
  }

  /** DuckDB replay of the k-component projection + whitening over
    * `embeddings` from the recorded (μ, V, λ) literals — per component
    * the same sequential fold and, for the whitened twin, the same
    * driver-computed √λ literal and single division. */
  def projectionKOracleSql(m: PcaKModel): String = {
    val muL = SqlReplay.dArr(m.mu)
    def fold(j: Int): String = {
      val vL = SqlReplay.dArr(m.vs(j))
      s"list_reduce(list_transform(range(1, len(embedding) + 1), " +
        s"i -> (CAST(embedding[i] AS DOUBLE) - ($muL)[i]) * ($vL)[i]), " +
        s"(acc, x) -> acc + x)"
    }
    val cols = (0 until m.k).flatMap { j =>
      val sq = java.lang.Double.toString(math.sqrt(m.lambdas(j)))
      Seq(
        s"CAST(floor(${fold(j)} * 1000000 + 0.5) AS BIGINT) AS pc${j + 1}_micro",
        s"CAST(floor(${fold(j)} / $sq * 1000000 + 0.5) AS BIGINT) AS white${j + 1}_micro")
    }
    s"""SELECT vec_id, label, ${cols.mkString(",\n       ")}
       FROM embeddings ORDER BY vec_id"""
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
