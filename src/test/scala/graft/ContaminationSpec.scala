package graft

import graft.ops.{Contamination, Dedup}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TokenShingleHashes.token_shingle_hashes

/** Contamination sweep: hashed-gram semantics vs the exact string-join
  * reference, the hot-shingle DF cap, and the broadcast-index plan shape. */
class ContaminationSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  // eval doc 100 shares 3 5-grams with train doc 1 (contaminated), and via
  // the common prefix exactly 1 with train doc 2 (below minOverlap); doc 3
  // is unrelated; doc 4 has null text (must be dropped, not NPE).
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon unrelated tail words here"),
    (3L, "completely different content with no shared grams at all"),
    (4L, null.asInstanceOf[String]),
    (100L, "alpha beta gamma delta epsilon zeta eta iota")
  ).toDF("doc_id", "text")

  test("hashed sweep equals the exact string-join reference") {
    // reference: the pre-round-4 implementation — string shingles self-join
    val sh = corpus.where(col("text").isNotNull)
      .select(col("doc_id"), explode(Dedup.tokenShingles(col("text"), 5)).as("sh"))
    val evalSh = sh.filter(col("doc_id") >= 100)
      .select(col("doc_id").as("eval_id"), col("sh"))
    val ref = sh.filter(col("doc_id") < 100).join(evalSh, "sh")
      .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= 1)
      .orderBy("doc_id", "eval_id").collect().toSeq
    val got = Contamination.sweep(corpus, "doc_id", "text",
        isEval = id => id >= 100, shingleN = 5, minOverlap = 1,
        maxShingleDf = 1000L)
      .orderBy("doc_id", "eval_id").collect().toSeq
    assert(ref.nonEmpty, "planted corpus must produce contamination pairs")
    assert(got == ref)
  }

  test("minOverlap threshold drops sub-threshold pairs") {
    val pairs = Contamination.sweep(corpus, "doc_id", "text",
        isEval = id => id >= 100, shingleN = 5, minOverlap = 3,
        maxShingleDf = 1000L)
      .select("doc_id", "eval_id", "overlap").as[(Long, Long, Long)]
      .collect().toSet
    // doc 1 shares grams "alpha..epsilon", "beta..zeta", "gamma..eta" (3);
    // doc 2 shares only "alpha..epsilon" (1) and must be gone
    assert(pairs == Set((1L, 100L, 3L)))
  }

  test("DF cap drops hot boilerplate grams but keeps the signal") {
    // boilerplate prefix shared by ALL docs -> its grams have df = 4 (all
    // non-null docs); with the cap below 4 those grams vanish, and a pair
    // whose only evidence is boilerplate disappears
    val boiler = corpus.where(col("text").isNotNull)
      .withColumn("text", concat(lit("one two three four five six "), col("text")))
    val noCap = Contamination.sweep(boiler, "doc_id", "text",
        isEval = id => id >= 100, shingleN = 5, minOverlap = 1,
        maxShingleDf = 1000L)
      .select("doc_id", "eval_id", "overlap").as[(Long, Long, Long)]
      .collect().map { case (a, b, c) => ((a, b), c) }.toMap
    val capped = Contamination.sweep(boiler, "doc_id", "text",
        isEval = id => id >= 100, shingleN = 5, minOverlap = 1,
        maxShingleDf = 3L)
      .select("doc_id", "eval_id", "overlap").as[(Long, Long, Long)]
      .collect().map { case (a, b, c) => ((a, b), c) }.toMap
    // uncapped: even unrelated doc 3 pairs with the eval doc via boilerplate
    assert(noCap.contains((3L, 100L)))
    // capped: the boilerplate-only pair is gone; real overlaps survive with
    // boilerplate's contribution removed
    assert(!capped.contains((3L, 100L)))
    assert(capped((1L, 100L)) > 0 && capped((1L, 100L)) < noCap((1L, 100L)))
  }

  test("gram hashes match string shingles: distinct count and cross-doc equality") {
    val rows = corpus.where(col("text").isNotNull)
      .select(col("doc_id"),
        size(Dedup.tokenShingles(col("text"), 5)).as("n_str"),
        size(token_shingle_hashes(col("text"), 5)).as("n_hash"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"doc ${r.getLong(0)}: ${r.getInt(1)} string grams vs ${r.getInt(2)} hashes"))
    // cross-doc: equal gram STRINGS in different documents must produce
    // equal hashes (a doc-dependent salt would zero every overlap while
    // passing the per-doc counts above) — per-doc hash-set intersections
    // must equal the string-shingle intersections
    val hashSets = corpus.where(col("text").isNotNull)
      .select(col("doc_id"), token_shingle_hashes(col("text"), 5).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val strSets = corpus.where(col("text").isNotNull)
      .select(col("doc_id"), Dedup.tokenShingles(col("text"), 5).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    for (a <- hashSets.keys; b <- hashSets.keys if a < b) {
      assert((hashSets(a) & hashSets(b)).size == (strSets(a) & strSets(b)).size,
        s"docs $a/$b: hash intersection disagrees with string intersection")
    }
    // and the planted overlaps are actually present cross-doc
    assert((hashSets(1L) & hashSets(100L)).size == 3)
    assert((hashSets(2L) & hashSets(100L)).size == 1)
  }

  test("train side joins against a broadcast index — no train-side shuffle before the join") {
    val plan = Contamination.sweep(corpus, "doc_id", "text",
      isEval = id => id >= 100).queryExecution.executedPlan
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "index join must broadcast")
    // the big (train) side of the broadcast join must not sit on a shuffle:
    // its subtree is scan -> project -> generate only
    val trainSide = bhj.head.children(if (bhj.head.buildSide.toString == "BuildRight") 0 else 1)
    val shuffles = collectWithSubqueries(trainSide) { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"train side must be map-only up to the index join:\n$trainSide")
  }

  test("broadcastIndex=false gives identical pairs via a shuffle join") {
    def run(b: Boolean) = Contamination.sweep(corpus, "doc_id", "text",
        isEval = id => id >= 100, shingleN = 5, minOverlap = 1,
        maxShingleDf = 1000L, broadcastIndex = b)
      .select("doc_id", "eval_id", "overlap").as[(Long, Long, Long)]
      .collect().toSet
    val (viaShuffle, viaBroadcast) = (run(false), run(true))
    assert(viaShuffle == viaBroadcast && viaBroadcast.nonEmpty)
    // and the opt-out really removes the forced hint (the OOM escape hatch
    // for caller-controlled giant eval sets) — auto-broadcast must be off
    // here or the planner re-broadcasts the tiny test index on size alone
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Contamination.sweep(corpus, "doc_id", "text",
          isEval = id => id >= 100, broadcastIndex = false)
        .queryExecution.executedPlan
      val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
      assert(bhj.isEmpty, s"broadcastIndex=false must not broadcast the index:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("TokenShingleHashes rejects non-positive shingleN at construction") {
    intercept[IllegalArgumentException](token_shingle_hashes(col("text"), 0))
    intercept[IllegalArgumentException](token_shingle_hashes(col("text"), -3))
  }
}
