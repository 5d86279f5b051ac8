package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversified top-k: greedily pick the candidate maximizing
  * λ·relevance − (1−λ)·max-similarity-to-already-picked, so the result
  * set covers the query's neighborhood instead of returning k near-
  * duplicates. The retrieval-stage twin of [[Coreset]]'s corpus-wide
  * traversal (same greedy chain, `greatest` running similarity instead
  * of `least` running distance, relevance-anchored objective).
  *
  * Numerics: relevance and pairwise similarities are the catalog's
  * milli-quantized integer cosines (exact long dots/norms, one
  * correctly-rounded sqrt·sqrt·divide each, then ppm floor); with
  * λ = [[LambdaNum]]/10 the objective 7·rel − 3·maxsim stays in exact
  * long arithmetic, so selection order is bit-stable and the DuckDB
  * oracle replays the identical chain with zero recorded literals.
  *
  * Scale shape: the corpus is touched ONCE (the relevance scan); the
  * greedy runs driver-side over the [[shortlist]]-row bounded TopK
  * result (a CAPPED collect — CollectAuditSpec), which is the honest
  * production shape: MMR diversifies a RESULT PAGE, so its input is a
  * shortlist by definition, never the corpus.
  */
object Mmr {

  /** λ = 7/10 — relevance weight; 1−λ = 3/10 diversity penalty.
    * Kept as integer numerators so the objective never leaves longs. */
  val LambdaNum = 7
  val DiversityNum = 3

  private def cosPpm(a: Array[Long], b: Array[Long]): Long = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    if (na == 0L || nb == 0L) 0L
    else math.floor(
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) *
        1e6 + 0.5).toLong
  }

  /** Diversified top-k over `emb(vec_id: long, q: array<long>)`.
    * The query point is the SMALLEST vec_id (deterministic, excluded
    * from candidates); relevance = cosine to it; candidates = the
    * `shortlist` most relevant (vec_id tiebreak); greedy MMR picks `k`.
    * Returns (sel_order, vec_id, rel_ppm, maxsim_ppm, mmr_score). */
  def diversifiedTopK(emb: DataFrame, k: Int, shortlist: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qRow = emb.orderBy("vec_id").limit(1).select("vec_id", "q").collect()
    require(qRow.nonEmpty, "MMR needs a non-empty corpus")
    val (qid, qv) = (qRow(0).getLong(0), qRow(0).getSeq[Long](1).toArray)
    // A zero-vector query makes rel_ppm = dot/0 (NaN→NULL in Spark, and
    // DuckDB may error casting floor(nan) to BIGINT) — fail fast instead
    // of letting the two engines diverge on a degenerate corpus. Mirrors
    // the candidate-side nq > 0 filter below.
    require(qv.exists(_ != 0L),
      s"MMR query vector (vec_id=$qid) is all-zero: relevance undefined")
    val withNorm = emb.filter(col("vec_id") =!= qid)
      .withColumn("dot", aggregate(
        zip_with(col("q"), typedlit(qv.toSeq), (x, y) => x * y),
        lit(0L), (a, v) => a + v))
      .withColumn("nq", aggregate(transform(col("q"), v => v * v),
        lit(0L), (a, v) => a + v))
      .filter(col("nq") > 0L)
      .withColumn("rel_ppm", floor(
        col("dot").cast("double") /
          (sqrt(col("nq").cast("double")) * sqrt(lit(
            qv.map(x => x * x).sum.toDouble))) * 1000000d + 0.5d)
        .cast("long"))
    val sl = TopK.perGroup(withNorm.withColumn("g", lit(1)), Seq("g"),
        Seq(("rel_ppm", false), ("vec_id", true)), k = shortlist,
        rankCol = "sl_rn")
      .select("vec_id", "q", "rel_ppm")
      .collect() // CAPPED: <= shortlist rows by the bounded heap
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    var remaining = sl.map { case (id, v, rel) => (id, v, rel, 0L) }.toVector
    var picks = Vector.empty[(Int, Long, Long, Long, Long)]
    var ord = 0
    while (ord < k && remaining.nonEmpty) {
      val best = remaining.maxBy { case (id, _, rel, ms) =>
        (LambdaNum * rel - DiversityNum * ms, -id) }
      val score = LambdaNum * best._3 - DiversityNum * best._4
      picks :+= ((ord, best._1, best._3, best._4, score))
      remaining = remaining.filter(_._1 != best._1)
        .map { case (id, v, rel, ms) =>
          (id, v, rel, math.max(ms, cosPpm(v, best._2))) }
      ord += 1
    }
    picks.toDF("sel_order", "vec_id", "rel_ppm", "maxsim_ppm", "mmr_score")
  }

  /** Static DuckDB replay: relevance scan + top-`shortlist` + the k-stage
    * greedy chain with a running `greatest` similarity — no literals. */
  def oracleSql(k: Int, shortlist: Int): String = {
    def dot(le: String, ri: String) =
      s"""list_sum(list_transform(range(1, len($le) + 1),
          i -> $le[CAST(i AS INT)] * $ri[CAST(i AS INT)]))"""
    def cos(le: String, ri: String, nl: String, nr: String) =
      s"""CAST(floor(CAST(${dot(le, ri)} AS DOUBLE)
          / (sqrt(CAST($nl AS DOUBLE)) * sqrt(CAST($nr AS DOUBLE)))
          * 1000000 + 0.5) AS BIGINT)"""
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (
        SELECT vec_id,
          list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
        FROM embeddings),
      n AS (SELECT vec_id, q,
          CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS nq
        FROM e),
      qv AS (SELECT vec_id AS qid, q AS qq, nq AS qn FROM n
             ORDER BY vec_id LIMIT 1),
      rel AS (SELECT n.vec_id, n.q, n.nq,
          ${cos("n.q", "p.qq", "n.nq", "p.qn")} AS rel_ppm
        FROM n, qv p WHERE n.vec_id <> p.qid AND n.nq > 0 AND p.qn > 0),
      sl AS (SELECT vec_id, q, nq, rel_ppm FROM rel
             ORDER BY rel_ppm DESC, vec_id LIMIT $shortlist),
      m0 AS (SELECT vec_id, q, nq, rel_ppm, CAST(0 AS BIGINT) AS ms
             FROM sl)"""
    for (i <- 1 to k) {
      sb ++= s""",
      c$i AS (SELECT vec_id, q, nq, rel_ppm, ms,
                CAST($LambdaNum * rel_ppm - $DiversityNum * ms AS BIGINT)
                  AS mmr_score
              FROM m${i - 1}
              ORDER BY $LambdaNum * rel_ppm - $DiversityNum * ms DESC,
                vec_id LIMIT 1)"""
      if (i < k)
        sb ++= s""",
      m$i AS (SELECT m.vec_id, m.q, m.nq, m.rel_ppm,
                greatest(m.ms, ${cos("m.q", "c.q", "m.nq", "c.nq")}) AS ms
              FROM m${i - 1} m, c$i c WHERE m.vec_id <> c.vec_id)"""
    }
    sb ++= (1 to k).map(i =>
      s"""
      SELECT CAST(${i - 1} AS INT) AS sel_order, vec_id, rel_ppm,
        CAST(ms AS BIGINT) AS maxsim_ppm, mmr_score FROM c$i""")
      .mkString("\n", " UNION ALL", "")
    sb ++= "\n      ORDER BY sel_order"
    sb.toString
  }
}
