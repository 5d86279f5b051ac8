package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TokenShingleHashes.token_shingle_hashes
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: the 64-bit gram hashes agree with the string shingles
  * they replace, on random token streams — per-doc distinct counts match
  * AND pairwise intersection sizes match (equal gram strings hash equal
  * across documents, unequal grams collide with ~2^-64 probability). These
  * are exactly the properties the contamination sweep's correctness rests
  * on; the fixture test in ContaminationSpec covers 5 hand-built docs,
  * this fuzzes the same contract over adversarial shapes: repeated tokens,
  * empty tokens (consecutive spaces), single-token docs shorter than one
  * gram, shared prefixes/suffixes. Fixed seeds, explicit sampling,
  * matching the repo's other property specs. */
class ShingleHashPropSpec extends SparkSpec {
  import spark.implicits._

  // small vocab => heavy gram overlap between docs; "" models the empty
  // tokens a double space produces
  private val tokGen = Gen.oneOf("a", "b", "ab", "ba", "x", "")
  private val docGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, tokGen))
    .map(_.mkString(" "))

  test("hash grams match string shingles: counts and pairwise intersections (60 random corpora)") {
    for (i <- 0 until 60) {
      val n = 2 + i % 5
      val texts = Gen.listOfN(6, docGen)
        .apply(Gen.Parameters.default, Seed(1000L + i)).get
      val df = texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val rows = df.select(col("doc_id"),
          token_shingle_hashes(col("text"), n).as("hs"),
          Dedup.tokenShingles(col("text"), n).as("ss"))
        .collect()
        .map(r => r.getLong(0) -> (r.getSeq[Long](1).toSet, r.getSeq[String](2).toSet))
        .toMap
      rows.foreach { case (id, (hs, ss)) =>
        assert(hs.size == ss.size,
          s"seed=$i n=$n doc=$id: ${ss.size} string grams vs ${hs.size} hashes for '${texts(id.toInt)}'")
      }
      for (a <- rows.keys; b <- rows.keys if a < b) {
        val ((ha, sa), (hb, sb)) = (rows(a), rows(b))
        assert((ha & hb).size == (sa & sb).size,
          s"seed=$i n=$n docs=$a/$b: hash intersection ${(ha & hb).size} != string ${(sa & sb).size}")
      }
    }
  }
}
