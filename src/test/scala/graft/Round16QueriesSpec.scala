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

  test("q_curate_pipeline_v3 quarantines the most-drifted batch: manifest equals v2 over the day minus that batch") {
    import spark.implicits._
    // day (doc_id % 5 == 0): ids 0..95 step 5 -> 4 range batches of 5
    // docs each. Batch 3 (ids 75..95) is ALL-OOV gibberish — by far the
    // highest KL against the reference (the %5!=0 corpus, which speaks
    // the 31-word vocabulary; KlVocabTopK=24 < 31 keeps a real <oov>
    // reference mass) -> quarantined. Texts are stride-walks over the
    // shared vocabulary (day stride 5, corpus stride 3), which makes
    // every doc distinct (no exact-dedup collapse), every 16-token
    // block unseen by the corpus (bloom gate passes), and every within-
    // day Jaccard exactly 13/31 < 0.5 (no near-dup drop). 24 words of
    // 7+ chars pass the funnel; langs round-robin so the mixture emits
    // >= 1 copy for the .25/.20-weight languages deterministically.
    val vocab = (0 until 31).map(i => f"word$i%02dx")
    val langs = Seq("en", "es", "fr", "de", "zh")
    def walk(start: Int, stride: Int) =
      (0 until 24).map(j => vocab((start + stride * j) % 31)).mkString(" ")
    def gib(j: Int) = (0 until 24).map(i => s"zz${j}q$i%02dxx").mkString(" ")
    def mk(id: Long, text: String) =
      (id, text, langs((id % 5).toInt max 0), s"src${id % 7}",
        text.length.toLong)
    def mkDay(id: Long, text: String) =
      (id, text, langs(((id / 5) % 5).toInt), s"src${id % 7}",
        text.length.toLong)
    val corpus = (1L to 99L).filter(_ % 5 != 0)
      .map(i => mk(i, walk(i.toInt % 31, 3)))
    val day = (0L to 95L by 5).map { i =>
      if (i >= 75) mkDay(i, gib((i / 5).toInt))
      else mkDay(i, walk(i.toInt % 31, 5))
    }
    val dir1 = tmp("r16v3a"); val dir2 = tmp("r16v3b")
    (corpus ++ day).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir1/documents.parquet")
    // dir2: the SAME corpus slice, the day WITHOUT the drifted batch
    (corpus ++ day.filter(_._1 < 75))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val v3 = SparkEntry.queries("q_curate_pipeline_v3")(spark, dir1)
      .collect().map(_.toSeq).toSeq
    val v2 = SparkEntry.queries("q_curate_pipeline_v2")(spark, dir2)
      .collect().map(_.toSeq).toSeq
    assert(v3.nonEmpty && v3 == v2)
    // and the gate is NOT a no-op: v3 over dir1 differs from v2 over dir1
    val v2full = SparkEntry.queries("q_curate_pipeline_v2")(spark, dir1)
      .collect().map(_.toSeq).toSeq
    assert(v3 != v2full)
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
