package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All-pairs set-similarity join with lossless prefix filtering
  * (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07 —
  * public literature; no reference-repo analogue, the reference has no
  * similarity operators at all).
  *
  * Finds every document pair whose element-set Jaccard is >= tau,
  * WITHOUT an all-pairs comparison and WITHOUT approximation — unlike
  * MinHash-LSH (probabilistic recall) this is exact, so it is fully
  * hash-oracled against a DuckDB blocking oracle.
  *
  * The prefix-filter theorem: order the element universe by a global
  * total order (here: document frequency ascending, then element —
  * rarest first). For a set A sorted in that order, let prefix(A) be its
  * first |A| - ceil(tau*|A|) + 1 elements. If Jaccard(A,B) >= tau then
  * |A∩B| >= tau*|A∪B| >= ceil(tau*max(|A|,|B|)), and a pair whose
  * prefixes are disjoint can share at most ceil(tau*|A|) - 1 elements of
  * A — contradiction. So candidates = pairs whose PREFIXES share an
  * element; everything else is safely skipped.
  *
  * THE ELEMENT CHOICE IS THE SCALE LEVER. Prefix filtering only prunes
  * when rare elements exist: on word SETS over a 31-word synthetic
  * vocabulary every "rare" word still hits thousands of documents and
  * the candidate set degenerates to all-pairs (measured: 14.3M of 12.5M
  * possible at sf0.1 — 114 s). Token 3-gram shingle sets
  * ([[Dedup.tokenShingles]]) blow the universe up to ~27k elements at
  * the same scale; the hottest PREFIX shingle then collides 8 docs and
  * the candidate set is 165k — 1.3% of all-pairs. Natural-language
  * corpora behave like the shingle case (Zipfian vocab, millions of
  * types), which is exactly the regime the Bayardo construction was
  * designed for.
  *
  * Scale shape (100 TB): three shuffles, none quadratic —
  *   1. element df: explode + count, map-side partial aggregation;
  *   2. prefix ranking: one shuffle join of (doc, element) with df + a
  *      per-doc window (bounded by the doc's set size);
  *   3. candidate join: prefix-element equi-join, fan-out per element t
  *      is C(df_prefix(t), 2) — bounded because high-df elements are
  *      excluded from prefixes by the rare-first order. (The classic
  *      extra guard at extreme scale — dropping elements above a df cap
  *      — turns the filter lossy; we keep it lossless.)
  * Verification touches candidates only: one join back to the (already
  * distinct) element arrays, `array_intersect`, integer-ratio Jaccard —
  * deterministic IEEE division, bit-identical to the oracle's.
  */
object SetSimJoin {

  /** Pairs (id_a < id_b) with element-set Jaccard >= tau, exact.
    *
    * `elems` is the set-valued expression to compare (e.g.
    * `Dedup.tokenShingles(col("text"), 3)`); it is array_distinct'd
    * here, so callers may pass raw arrays. Rows whose `elems` is NULL
    * are dropped.
    *
    * `tau` is interpreted as the RATIONAL its shortest decimal form
    * denotes (0.7 → 7/10, 0.75 → 3/4 — `BigDecimal.valueOf`, i.e. the
    * round-trip `Double.toString` representation), and all threshold
    * arithmetic is then exact — see [[similarPairsRational]]. This
    * closes the FP hole where `ceil(tau * n)` could land on the wrong
    * side of an integer for a tau not representable in binary (e.g.
    * 0.7 * n computed in doubles) and silently shorten the prefix,
    * turning the lossless guarantee into a scaladoc promise. */
  def similarPairs(docs: DataFrame, idCol: String, elems: Column,
      tau: Double): DataFrame = {
    val bd = java.math.BigDecimal.valueOf(tau) // shortest decimal form
    require(bd.scale <= 9 && bd.precision - bd.scale <= 1,
      s"tau must be a short decimal in (0, 1]: $tau")
    val den = java.math.BigDecimal.TEN.pow(math.max(bd.scale, 0))
    similarPairsRational(docs, idCol, elems,
      bd.movePointRight(math.max(bd.scale, 0)).longValueExact,
      den.longValueExact)
  }

  /** Directed exact CONTAINMENT join: every (probe, corpus-doc) pair with
    * |probe ∩ doc| / |probe| >= tauNum/tauDen — "how much of this text is
    * inside that one", the quote/clone/contamination detection primitive.
    * Asymmetric on purpose: Jaccard punishes a short probe quoted inside
    * a long document (union-normalized), containment does not — which is
    * why benchmark-leak sweeps are containment sweeps. Unlike
    * [[graft.ops.Contamination]]'s broadcast-index sweep, BOTH sides here
    * may be corpus-scale: no broadcast anywhere.
    *
    * Same lossless prefix-filter theorem as [[similarPairsRational]],
    * asymmetric form: if |A∩B| >= ceil(tau·|A|), then any fixed
    * |A| − ceil(tau·|A|) + 1 elements of A must intersect B — so
    * candidates are pairs where B contains ANY element of A's prefix,
    * with the prefix chosen rarest-first by CORPUS document frequency
    * (elements the corpus has never seen rank rarest of all and prune
    * hardest). The probe side prefixes; the corpus side indexes all its
    * elements — per-element join fan-out is prefixDf(t) · df(t), bounded
    * by rare-first prefixes exactly as in the symmetric join.
    * Acceptance is pure integer arithmetic (inter·tauDen >= tauNum·|A|);
    * the reported ppm is integer too. */
  def containedPairsRational(probes: DataFrame, probeId: String,
      probeElems: Column, corpus: DataFrame, corpusId: String,
      corpusElems: Column, tauNum: Long, tauDen: Long): DataFrame = {
    require(tauDen > 0 && tauNum > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1]: $tauNum/$tauDen")
    val pa = probes.select(col(probeId).as("probe_id"),
        array_distinct(probeElems).as("pa"))
      .filter(col("pa").isNotNull)
      .withColumn("n_probe", size(col("pa")))
    val cb = corpus.select(col(corpusId).as("doc_id"),
        array_distinct(corpusElems).as("cb"))
      .filter(col("cb").isNotNull)
    val corpTok = cb.select(col("doc_id"), explode(col("cb")).as("tok"))
    val tokDf = corpTok.groupBy("tok").agg(count(lit(1)).as("df"))
    val probePrefix = pa
      .select(col("probe_id"), col("n_probe"), explode(col("pa")).as("tok"))
      .join(tokDf, Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("df"), col("tok"))))
      .filter(col("rk") <= col("n_probe") -
        expr(s"(${tauNum}L * n_probe + ${tauDen - 1}L) div ${tauDen}L") + 1)
      .select("probe_id", "tok")
    val cands = probePrefix.join(corpTok, "tok")
      .select("probe_id", "doc_id").distinct()
    cands
      .join(pa, "probe_id").join(cb, "doc_id")
      .withColumn("inter", size(array_intersect(col("pa"), col("cb"))))
      .filter(col("inter") * lit(tauDen) >= lit(tauNum) * col("n_probe"))
      .select(col("probe_id"), col("doc_id"), col("n_probe"), col("inter"),
        expr("inter * 1000000L div n_probe").as("cont_ppm"))
  }

  /** [[similarPairs]] with the threshold as an exact rational
    * tauNum/tauDen — every comparison against it is integer arithmetic:
    *
    *  - prefix length: n - ceil(tauNum*n / tauDen) + 1, with the ceil as
    *    `(tauNum*n + tauDen - 1) div tauDen` (longs; n <= 2^31 and any
    *    practical tauDen keep the product far from overflow);
    *  - final acceptance: Jaccard >= tau ⟺ inter * (tauNum + tauDen)
    *    >= tauNum * (|A| + |B|), since union = |A| + |B| - inter —
    *    integers only, no division at all.
    *
    * The reported `jac` column stays a double ratio of ints (correctly
    * rounded IEEE division, bit-identical across engines) but is no
    * longer what the filter tests. */
  def similarPairsRational(docs: DataFrame, idCol: String, elems: Column,
      tauNum: Long, tauDen: Long): DataFrame = {
    require(tauDen > 0 && tauNum > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1]: $tauNum/$tauDen")
    val toks = docs.select(col(idCol).as("doc_id"),
        array_distinct(elems).as("toks"))
      .filter(col("toks").isNotNull)
      .withColumn("n", size(col("toks")))

    val docTok = toks.select(col("doc_id"), col("n"),
      explode(col("toks")).as("tok"))
    val tokDf = docTok.groupBy("tok").agg(count(lit(1)).as("df"))

    // Rank each doc's elements rare-first; keep the lossless prefix.
    // Integer ceil-div: no FP anywhere near the boundary.
    val prefix = docTok.join(tokDf, "tok")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))))
      .filter(col("rk") <= col("n") -
        expr(s"(${tauNum}L * n + ${tauDen - 1}L) div ${tauDen}L") + 1)
      .select("doc_id", "tok")

    val cands = prefix.select(col("doc_id").as("id_a"), col("tok"))
      .join(prefix.select(col("doc_id").as("id_b"), col("tok")), "tok")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val ta = toks.select(col("doc_id").as("id_a"), col("toks").as("t_a"))
    val tb = toks.select(col("doc_id").as("id_b"), col("toks").as("t_b"))
    cands.join(ta, "id_a").join(tb, "id_b")
      .withColumn("__inter", size(array_intersect(col("t_a"), col("t_b"))))
      .filter(col("__inter") * lit(tauNum + tauDen) >=
        lit(tauNum) * (size(col("t_a")) + size(col("t_b"))))
      .withColumn("jac", col("__inter").cast("double") /
        (size(col("t_a")) + size(col("t_b")) - col("__inter")))
      .select("id_a", "id_b", "jac")
      .orderBy("id_a", "id_b")
  }
}
