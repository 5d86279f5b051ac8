package graft

/** Round-16 guard fixtures: the degenerate-input contracts added on the
  * round-15 advice (MMR zero-norm query, k-center's k-envelope) — each a
  * fail-fast `require` whose absence would let the two oracle engines
  * diverge (NaN→NULL vs cast error) or let a caller quietly go
  * quadratic.
  */
class Round16QueriesSpec extends SparkSpec {

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  test("Mmr.diversifiedTopK fails fast on an all-zero query vector") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(0L, 0L)), // the smallest vec_id becomes the query point
      (1L, Seq(1000L, 0L)), (2L, Seq(0L, 1000L)))
      .toDF("vec_id", "q")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Mmr.diversifiedTopK(emb, k = 2, shortlist = 8)
    }
    assert(ex.getMessage.contains("all-zero"))
  }

  test("Coreset.kCenter enforces the k <= 64 lineage envelope") {
    import spark.implicits._
    val emb = Seq((0L, 0, Seq(0L, 0L)), (1L, 0, Seq(1000L, 0L)))
      .toDF("vec_id", "label", "q")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Coreset.kCenter(emb, k = 65)
    }
    assert(ex.getMessage.contains("64"))
    // the envelope boundary itself stays legal (covered corpus stops early)
    val ok = graft.ops.Coreset.kCenter(emb, k = 64).collect()
    assert(ok.length == 2)
  }
}
