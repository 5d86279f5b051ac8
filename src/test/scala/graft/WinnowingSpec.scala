package graft

import graft.ops.Winnowing
import org.apache.spark.sql.functions._

/** ops.Winnowing invariants that complement the full-chain DuckDB oracle:
  * the paper's recall guarantee (a shared token run of w + k − 1 forces a
  * shared fingerprint), the completeness rule for short docs, and the
  * density bound.
  */
class WinnowingSpec extends SparkSpec {

  private val (k, w) = (4, 4)

  test("guaranteed recall: a shared run of w+k-1 tokens forces a shared fingerprint") {
    import spark.implicits._
    // 7 shared tokens (= w + k - 1) embedded in otherwise-disjoint text:
    // both docs contain one identical WINDOW of k-grams, whose minimum
    // they select identically — the pair must surface even at
    // minShared = 1 with no df cap pressure.
    val run = "zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 $run b1 b2 b3 b4"),
      (2L, s"c1 c2 c3 $run d1 d2 d3 d4 d5 d6"),
      (3L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.sharedFingerprintPairs(docs, "doc_id", "text",
        k, w, maxDf = 100L, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"disjoint doc matched: $pairs")
  }

  test("completeness rule: docs shorter than w+k-1 tokens emit no fingerprints") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),                 // < k tokens: no grams at all
      (2L, "a b c d e f"),           // k..w+k-2: grams but no complete window
      (3L, "a b c d e f g"))         // exactly w+k-1: one window
      .toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k, w)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!fp.contains(1L) && !fp.contains(2L), fp.toString)
    assert(fp(3L) == 1L, fp.toString)
  }

  test("density: fingerprints per doc stay well under the gram count on the corpus") {
    val docs = graft.queries.tbl(spark, "/root/testdata/sf0.001", "documents")
    val nFp = Winnowing.fingerprints(docs, "doc_id", "text", k, w).count()
    val nGrams = docs
      .select(greatest(size(split(col("text"), " ")) - (k - 1), lit(0)).as("g"))
      .agg(sum("g")).collect().head.getLong(0)
    assert(nFp > 0)
    // expected density 2/(w+1) = 0.4; allow slack for short docs and the
    // distinct collapse, but the index must be a strict minority of grams
    assert(nFp.toDouble / nGrams < 0.6,
      s"fingerprint density ${nFp.toDouble / nGrams} not sparse ($nFp / $nGrams)")
  }
}
