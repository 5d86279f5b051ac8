package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center selection (Gonzalez 1985 farthest-point traversal) —
  * the 2-approximation coreset / diverse-seed picker: start from a
  * deterministic seed, then repeatedly take the point FARTHEST from
  * everything chosen so far. The LLM-data use is diverse sampling — k
  * maximally-spread exemplars per corpus for eval panels, clustering
  * inits (k-means++'s deterministic cousin), or annotation batches where
  * near-duplicate picks waste labeling budget.
  *
  * Numerics: distances are EXACT squared euclidean over the caller's
  * integer-quantized components — monotone in true distance, so argmax
  * selection never needs sqrt and the whole traversal is integer
  * arithmetic (zero FP, zero recorded literals; the DuckDB oracle in
  * [[oracleSql]] replays the identical chain).
  *
  * Scale shape: k rounds, each ONE narrow map over the cached corpus
  * plus a one-row TakeOrdered argmax — k·|corpus| distance evals total
  * on the Spark side (the running min-distance column is carried
  * forward), never a pairwise join. Driver state = k rows. The
  * per-round driver collect is `limit(1)`-bounded (CollectAuditSpec).
  * Lineage note: the carried `md` column re-derives from the cached
  * quantized corpus on each action, so round i re-evaluates i distance
  * folds per row — O(k²·|corpus|/2) folds worst-case, fine for the
  * seed-selection k's this targets (k ≤ dozens); checkpoint `cur` per
  * round if k ever grows past that.
  */
object Coreset {

  /** Exact squared distance from the quantized component array `q` to a
    * literal center vector — expanded to Σq² − 2·q·c + Σc² over the
    * native DotLong kernel (r16): the HOF fold was interpreted per
    * element per round. The expansion is an exact integer identity
    * (milli components ≤ ~2·10³, d = 64 → every term ≤ ~10⁹, no
    * overflow), so values are bit-identical to the direct fold the
    * DuckDB oracle replays. */
  private def d2(q: Column, center: Seq[Long]): Column = {
    val c2 = center.map(v => v * v).sum
    import org.apache.spark.sql.graft.DotLong.dot_long
    dot_long(q, q) - lit(2L) * dot_long(q, typedlit(center)) + lit(c2)
  }

  /** Greedy k-center over `emb(vec_id: long, label: int, q: array<long>)`.
    * Returns one row per selection:
    * (sel_order, vec_id, label, d2_sel = distance to the already-chosen
    * set at selection time — 0 for the seed, non-increasing after; the
    * k-th value is the 2-approximation radius bound). Seed = smallest
    * vec_id (deterministic on any engine). Stops early (fewer than k
    * rows) if the corpus is covered — the farthest remaining distance
    * hits 0 — rather than re-selecting covered points. */
  def kCenter(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // The carried `md` column re-derives i distance folds per row on
    // round i (O(k²·|corpus|) total) because each round's action
    // recomputes the whole withColumn chain from the cached corpus.
    // Fine for seed-selection k's (the documented envelope); enforce it
    // as a contract so a large k can't quietly go quadratic — past this,
    // checkpoint/localCheckpoint `cur` every few rounds instead.
    require(k <= 64,
      s"kCenter's lineage re-derive is O(k²·corpus); k=$k exceeds the " +
        "supported envelope of 64 — checkpoint cur per round for larger k")
    val spark = emb.sparkSession
    import spark.implicits._
    val cached = emb.select("vec_id", "label", "q").persist()
    try {
      val seed = cached.orderBy("vec_id").limit(1).collect()
      require(seed.nonEmpty, "k-center needs a non-empty corpus")
      var picks = Vector[(Long, Int, Seq[Long], Long)](
        (seed(0).getLong(0), seed(0).getInt(1), seed(0).getSeq[Long](2), 0L))
      var cur = cached.withColumn("md", d2(col("q"), picks.head._3))
      var i = 1
      var covered = false
      while (i < k && !covered) {
        val nxt = cur.orderBy(desc("md"), asc("vec_id")).limit(1).collect()
        // farthest distance 0 = every point coincides with a chosen
        // center: the corpus is covered, further picks would re-select
        // covered points. Stop (the oracle's WHERE md > 0 twin).
        if (nxt.isEmpty || nxt(0).getLong(3) == 0L) covered = true
        else {
          picks :+= ((nxt(0).getLong(0), nxt(0).getInt(1),
            nxt(0).getSeq[Long](2), nxt(0).getLong(3)))
          if (i < k - 1)
            cur = cur.withColumn("md",
              least(col("md"), d2(col("q"), picks.last._3)))
          i += 1
        }
      }
      picks.zipWithIndex
        .map { case ((id, lab, _, d), ord) => (ord, id, lab, d) }
        .toDF("sel_order", "vec_id", "label", "d2_sel")
    } finally { cached.unpersist(); () }
  }

  /** Static DuckDB replay of the identical traversal — k chained CTEs,
    * each "distances against the previous pick, then a one-row argmax"
    * (ties to the smaller vec_id, like the Spark orderBy). No recorded
    * literals: both engines derive every pick from the data. */
  def oracleSql(k: Int): String = {
    def fold(le: String, ri: String) =
      s"""list_sum(list_transform(range(1, len($le) + 1),
          i -> ($le[CAST(i AS INT)] - $ri[CAST(i AS INT)])
             * ($le[CAST(i AS INT)] - $ri[CAST(i AS INT)])))"""
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (
        SELECT vec_id, label,
          list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
        FROM embeddings),
      c0 AS (SELECT vec_id, label, q, CAST(0 AS BIGINT) AS md
             FROM e ORDER BY vec_id LIMIT 1),
      m0 AS (SELECT e.vec_id, e.label, e.q,
               ${fold("e.q", "c.q")} AS md
             FROM e, c0 c)"""
    for (i <- 1 until k) {
      sb ++= s""",
      c$i AS (SELECT vec_id, label, q, CAST(md AS BIGINT) AS md
              FROM m${i - 1} WHERE md > 0
              ORDER BY md DESC, vec_id LIMIT 1)"""
      if (i < k - 1)
        sb ++= s""",
      m$i AS (SELECT m.vec_id, m.label, m.q,
                least(m.md, ${fold("m.q", "c.q")}) AS md
              FROM m${i - 1} m, c$i c)"""
    }
    sb ++= (0 until k).map(i =>
      s"""
      SELECT CAST($i AS INT) AS sel_order, vec_id, label,
        CAST(md AS BIGINT) AS d2_sel FROM c$i""")
      .mkString("\n", " UNION ALL", "")
    sb ++= "\n      ORDER BY sel_order"
    sb.toString
  }
}
