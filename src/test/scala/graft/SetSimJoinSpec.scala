package graft

import graft.ops.SetSimJoin
import org.apache.spark.sql.functions._

/** Contract tests for the prefix-filtered set-similarity join. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Seq[String])], tau: Double) =
    SetSimJoin.similarPairs(
      rows.toDF("doc_id", "elems"), "doc_id", col("elems"), tau)

  test("finds exactly the pairs at or above tau, nothing else") {
    // A={a,b,c,d}, B={a,b,c,e} -> J=3/5=0.6; C={a,b,c,d} -> J(A,C)=1.0,
    // J(B,C)=0.6; D={x,y} disjoint from all.
    val out = pairs(Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("a", "b", "c", "d"),
      4L -> Seq("x", "y")), tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 0.6), (1L, 3L, 1.0), (2L, 3L, 0.6)))
  }

  test("containment join finds a planted quote and is lossless vs brute force") {
    // probe 10 = doc 1's elements exactly (cont=1 against doc 1); probe
    // 11 half-overlaps docs 1 and 2; the brute-force ground truth at
    // tau=1/2 must match the prefix-filtered result exactly.
    val corpus = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("c", "d", "e", "f"),
      3L -> Seq("x", "y", "z"))
    val probes = Seq(
      10L -> Seq("a", "b", "c", "d"),
      11L -> Seq("c", "d", "q", "r"))
    val got = SetSimJoin.containedPairsRational(
        probes.toDF("pid", "elems"), "pid", col("elems"),
        corpus.toDF("doc_id", "elems"), "doc_id", col("elems"), 1, 2)
      .as[(Long, Long, Int, Int, Long)].collect().toSet
    val want = (for {
      (pid, pa) <- probes; (did, cb) <- corpus
      inter = pa.toSet.intersect(cb.toSet).size
      if inter * 2 >= pa.size
    } yield (pid, did, pa.size, inter, inter * 1000000L / pa.size)).toSet
    assert(got == want && want.contains((10L, 1L, 4, 4, 1000000L)), s"$got")
  }

  test("prefix filter is lossless: matches brute force on random-ish sets") {
    // 40 docs over a 12-element universe (deterministic construction) —
    // small universe forces heavy prefix collisions AND near-threshold
    // pairs, the regime where an off-by-one prefix length loses pairs.
    val universe = ('a' to 'l').map(_.toString)
    val docs = (0 until 40).map { i =>
      (i.toLong, universe.filter(u => (i * 31 + u.hashCode) % 3 != 0))
    }
    val tau = 0.75
    val got = pairs(docs, tau).as[(Long, Long, Double)].collect().toSet
    val want = (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      jac = inter.toDouble / (sa.toSet.size + sb.toSet.size - inter)
      if jac >= tau
    } yield (ia, ib, jac)).toSet
    assert(got == want, s"prefix filter dropped or invented pairs")
    assert(want.nonEmpty, "degenerate fixture: no qualifying pairs")
  }

  test("non-binary tau (0.7) is exact: rational threshold matches brute force") {
    // 0.7 has no finite binary representation — the old double
    // `ceil(tau*n)` could shorten the prefix by one for unlucky n. The
    // rational path (7/10) must match brute force on a fixture dense in
    // near-threshold pairs, and the explicit-rational entry point must
    // agree with the decimal-interpreted double.
    val universe = ('a' to 'n').map(_.toString)
    val docs = (0 until 50).map { i =>
      (i.toLong, universe.filter(u => (i * 37 + u.hashCode) % 4 != 0))
    }
    val got = pairs(docs, tau = 0.7).as[(Long, Long, Double)].collect().toSet
    val viaRational = SetSimJoin.similarPairsRational(
        docs.toDF("doc_id", "elems"), "doc_id", col("elems"), 7L, 10L)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == viaRational, "double and rational entry points disagree")
    val want = (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      union = sa.toSet.size + sb.toSet.size - inter
      if inter * 10 >= 7 * union // exact rational acceptance
    } yield (ia, ib, inter.toDouble / union)).toSet
    assert(got == want, "rational prefix filter dropped or invented pairs")
    assert(want.nonEmpty, "degenerate fixture: no qualifying pairs")
  }

  test("duplicate elements and null sets are tolerated") {
    val out = SetSimJoin.similarPairs(
      Seq((1L, Seq("a", "a", "b")), (2L, Seq("b", "a", "b")))
        .toDF("doc_id", "elems")
        .union(Seq((3L, null: Seq[String])).toDF("doc_id", "elems")),
      "doc_id", col("elems"), tau = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 1.0)))
  }
}
