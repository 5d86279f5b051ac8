package graft

import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-14 late additions (BM25
  * retrieval, KL corpus-drift, CUSUM change-point) — the invariants the
  * DuckDB hash oracles can't state directly: exact integer traces,
  * ranking order, OOV mass conservation.
  */
class Round14QueriesSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14").toString
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_events_cusum: burst day spikes by its excess volume; flat stream scores 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    def ts(day: Int, i: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-0$day%d 00:00:${i % 60}%02d")
    // type a: daily counts 2,2,2,2,7 (n_days=5, tot=15)
    //   dev = 5*c-15 -> -5,-5,-5,-5,+20; prefix -5,-10,-15,-20,0
    //   running min -5,-10,-15,-20,-20 -> cusum 0,0,0,0,20
    // type b: flat 3,3,3 -> dev 0 everywhere -> cusum 0
    val aCounts = Seq(2, 2, 2, 2, 7)
    val rows =
      aCounts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(i => (d * 100L + i, ts(d + 1, i), 1L, "a", 0.0, "{}"))
      } ++
      (0 until 3).flatMap(d =>
        (0 until 3).map(i => (900L + d * 10 + i, ts(d + 1, i), 1L, "b", 0.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_events_cusum")(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val expected =
      aCounts.zipWithIndex.map { case (c, d) =>
        ("a", s"2024-01-0${d + 1}") -> ((c.toLong, if (c == 7) 20L else 0L))
      }.toMap ++
      (0 until 3).map(d => ("b", s"2024-01-0${d + 1}") -> ((3L, 0L))).toMap
    assert(out == expected, out.toString)
  }

  test("q_text_bm25: multi-term match outranks single-term; non-matching docs and queries absent") {
    // Query 1 = (vector, scan). avgdl = 10/4 = 2.5.
    //   doc 1 "vector scan vector"  matches both terms -> top
    //   doc 2 "scan scan scan"      tf=3, dl=3 -> tfpart 6.6/4.38 = 1.507
    //   doc 4 "vector"              tf=1, dl=1 -> tfpart 2.2/1.66 = 1.325
    //   (same idf for both terms: df=2 each) -> order 1, 2, 4; doc 3 absent.
    // Query 2 = (hash, join, merge): nothing matches -> query absent.
    // Query 3 = (stream, window, the): only doc 3 matches ('the').
    val dir = docsDir(Seq(
      (1L, "vector scan vector", "s1"),
      (2L, "scan scan scan", "s1"),
      (3L, "the the the", "s2"),
      (4L, "vector", "s2")))
    val out = SparkEntry.queries("q_text_bm25")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val q1 = out.filter(_._1 == 1).sortBy(_._2)
    assert(q1.map(_._3).toSeq == Seq(1L, 2L, 4L), q1.mkString(","))
    assert(q1.map(_._2).toSeq == Seq(1, 2, 3))
    assert(q1.forall(_._4 > 0L))
    // scores strictly descend (no tie in this fixture)
    assert(q1.map(_._4).toSeq == q1.map(_._4).sorted(Ordering[Long].reverse).toSeq)
    assert(!out.exists(_._1 == 2), "query with no matching docs must vanish")
    val q3 = out.filter(_._1 == 3)
    assert(q3.map(x => (x._2, x._3)).toSeq == Seq((1, 3L)), q3.mkString(","))
  }

  test("q_text_kl_drift: identical-distribution sources score exactly 0") {
    // A and B have the SAME unigram distribution, so each equals the
    // corpus distribution -> every ratio is exactly 1.0 in IEEE
    // arithmetic (integer products < 2^53 are exact) -> ln(1)=0 -> 0.
    val dir = docsDir(Seq(
      (1L, "x y", "A"),
      (2L, "x y", "B")))
    val out = SparkEntry.queries("q_text_kl_drift")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map("A" -> ((2L, 2L, 0L)), "B" -> ((2L, 2L, 0L))), out.toString)
  }

  test("q_text_kl_drift: skewed source scores highest; KL stays ~non-negative") {
    // corpus: x=6, y=2 (tot 8). C is all-x (max drift); A/B are balanced.
    val dir = docsDir(Seq(
      (1L, "x y", "A"),
      (2L, "x y", "B"),
      (3L, "x x x x", "C")))
    val out = SparkEntry.queries("q_text_kl_drift")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("C") > 0L, out.toString)
    assert(out("C") > out("A") && out("C") > out("B"), out.toString)
    assert(out("A") == out("B"), "symmetric sources must score identically")
    // quantization can shave <1 micro-nat per bucket off a true-0 KL but
    // a real divergence stays positive; A's true KL here is ~0.14 nats
    assert(out("A") > 0L, out.toString)
  }

  test("q_text_kl_drift: OOV bucket binds past the top-K vocabulary and conserves mass") {
    // 30 distinct terms from one source: 24 kept + 1 '<oov>' bucket; the
    // pruned tail's tokens must be AGGREGATED (tot_tok = all 30+24=54
    // tokens), not dropped. Repeat w0..w23 twice so the kept set is
    // deterministic (counts 2 beat the 6 singleton tail terms).
    val text = ((0 until 24).flatMap(i => Seq(s"w$i", s"w$i")) ++
      (24 until 30).map(i => s"w$i")).mkString(" ")
    val dir = docsDir(Seq((1L, text, "A")))
    val r = SparkEntry.queries("q_text_kl_drift")(spark, dir).collect().head
    assert(r.getString(0) == "A")
    assert(r.getLong(1) == 25L, s"n_buckets = ${r.getLong(1)}")  // 24 kept + <oov>
    assert(r.getLong(2) == 54L, s"tot_tok = ${r.getLong(2)}")
    // single source == corpus -> every ratio exactly 1 -> KL exactly 0
    assert(r.getLong(3) == 0L, s"kl_micro = ${r.getLong(3)}")
  }
}
