package graft

import graft.ops.SubstringDedup
import org.apache.spark.sql.DataFrame

/** Planted-data contracts for exact-substring dedup: run lengths are
  * EXACT (anchors + minRun - 1 reconstructs the true token run), runs
  * separate per alignment diagonal, sub-minRun overlap is invisible, and
  * the DF cap drops boilerplate anchors. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def runs(d: DataFrame, minRun: Int, cap: Long = 100000L) =
    SubstringDedup.longestSharedRuns(d, "doc_id", "text", minRun, cap)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap

  // distinct filler tokens so unrelated docs never share a gram
  private def filler(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a shared run is reported with its exact token length") {
    val shared = filler("s", 8) // 8 shared tokens
    val d = docs(
      1L -> (filler("a", 5) ++ shared ++ filler("b", 5)).mkString(" "),
      2L -> (filler("c", 9) ++ shared ++ filler("d", 2)).mkString(" "),
      3L -> filler("e", 20).mkString(" "))
    val out = runs(d, minRun = 5)
    // 8-token run at different offsets (diag = 5 - 9 = -4): exactly one
    // pair, max_run = 8, one maximal run
    assert(out == Map((1L, 2L) -> ((8L, 1L))))
  }

  test("overlap shorter than minRun is invisible; equal to minRun is the floor") {
    val shared = filler("s", 5)
    val d = docs(
      1L -> (shared ++ filler("a", 10)).mkString(" "),
      2L -> (filler("b", 10) ++ shared).mkString(" "))
    assert(runs(d, minRun = 5) == Map((1L, 2L) -> ((5L, 1L))))
    assert(runs(d, minRun = 6).isEmpty,
      "a 5-token overlap must not surface at minRun = 6")
  }

  test("two disjoint shared runs stay separate maximal runs") {
    val r1 = filler("x", 5)
    val r2 = filler("y", 7)
    val d = docs(
      1L -> (r1 ++ filler("a", 4) ++ r2).mkString(" "),
      2L -> (r1 ++ filler("b", 4) ++ r2).mkString(" "))
    // both runs sit on the SAME diagonal (equal offsets) but are split by
    // the non-matching gap: n_runs = 2, max = 7
    assert(runs(d, minRun = 5) == Map((1L, 2L) -> ((7L, 2L))))
  }

  test("a document shorter than minRun emits no grams and never pairs") {
    val d = docs(
      1L -> filler("s", 4).mkString(" "),
      2L -> filler("s", 4).mkString(" "), // identical, but only 4 tokens
      3L -> (null: String))
    assert(runs(d, minRun = 5).isEmpty)
  }

  test("identical documents report a full-length run") {
    val text = filler("t", 12).mkString(" ")
    val out = runs(docs(1L -> text, 2L -> text), minRun = 5)
    assert(out == Map((1L, 2L) -> ((12L, 1L))))
  }

  test("the DF cap drops boilerplate anchors but exact mode keeps them") {
    // one 5-token boilerplate block present in ALL 6 docs; doc pairs share
    // nothing else. With the cap above corpus DF the block pairs everyone
    // (15 pairs); with the cap at 3 its anchor gram (df = 6) is dropped
    // and no pair survives.
    val block = filler("boiler", 5)
    val d = docs((1L to 6L).map(i =>
      i -> (filler(s"u$i-", 6) ++ block ++ filler(s"v$i-", 6)).mkString(" ")): _*)
    assert(runs(d, minRun = 5).size == 15)
    assert(runs(d, minRun = 5, cap = 3L).isEmpty)
  }

  test("periodic text terminates with sane bounded output") {
    // "p0 p1 p0 p1 ..." x 10 in both docs: many diagonals, each an island;
    // the longest is the full 20-token alignment
    val period = (0 until 10).flatMap(_ => Seq("p0", "p1"))
    val out = runs(docs(1L -> period.mkString(" "), 2L -> period.mkString(" ")),
      minRun = 5)
    assert(out((1L, 2L))._1 == 20L)
  }
}
