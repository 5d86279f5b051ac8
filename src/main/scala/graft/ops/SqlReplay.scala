package graft.ops

/** DuckDB replay snippets shared by the generated ANN / PQ oracles
  * ([[Similarity.lshAnnOracleSql]], [[Similarity.ivfAnnOracleSql]],
  * [[Similarity.ivfPqAnnOracleSql]], [[ProductQuantizer.reconStatsOracleSql]]).
  *
  * Why the replayed doubles are BIT-IDENTICAL to the engine's, not merely
  * close: every number those queries rank on is a sequential left fold in
  * doubles — the `aggregate(zip_with(...))` HOFs fold `(((0.0 + x1) + x2)
  * + x3)...`, and the native `cosine_sim` loop accumulates `dot/na/nb`
  * left-to-right from 0.0. DuckDB's `list_reduce` without an initial
  * value folds `f(f(x1, x2), x3)...`, and `0.0 + x1 == x1` exactly in
  * IEEE, so the two accumulation sequences are the same sequence.
  * `sqrt` and `/` are correctly rounded on both engines, float→double
  * widening is exact, and `Double.toString` literals round-trip (Java
  * prints enough digits; DuckDB's parse is correctly rounded). Rank
  * comparisons over bit-identical doubles cannot diverge, which is what
  * upgrades the ANN tier from rows-only to full hash-match oracles.
  */
private[ops] object SqlReplay {

  /** A DOUBLE[] literal that parses back to the exact same bits. */
  def dArr(v: Array[Double]): String =
    s"[${v.map(java.lang.Double.toString).mkString(", ")}]"

  /** Σ a_i·b_i, sequential — replays `Similarity.dot` / the native
    * cosine's dot accumulation. */
  def dot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i] * $b[i]), (acc, x) -> acc + x)"

  /** Σ a_i², sequential — replays `Similarity.sqNorm`. */
  def sq(a: String): String = dot(a, a)

  /** Σ (a_i − b_i)², sequential — replays
    * `SemanticDedup.nearestCentroidDist`'s per-centroid distance. */
  def sqDiff(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (acc, x) -> acc + x)"

  /** The native `cosine_sim` including its zero-norm guard, with norms
    * precomputed as `an`/`bn` (sqrt of the [[sq]] fold — `na == 0.0` iff
    * `sqrt(na) == 0.0`, and `dot / (sqrt(na) * sqrt(nb))` multiplies the
    * two square roots exactly like the guard's else-branch). */
  def cosGuarded(a: String, b: String, an: String, bn: String): String =
    s"CASE WHEN $an = 0 OR $bn = 0 THEN 0.0 " +
      s"ELSE ${dot(a, b)} / ($an * $bn) END"
}
