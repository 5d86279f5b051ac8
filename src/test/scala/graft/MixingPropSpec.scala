package graft

import graft.ops.Mixing
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants of domain mixing, driven by ScalaCheck
  * generators with fixed seeds (scalatestplus isn't in the offline cache,
  * so sampling is explicit). For random corpora and random weight maps:
  *   - every document appears floor(r_d) or ceil(r_d) times (r_d capped),
  *   - realized per-domain unit mass is within the one-document-quantum
  *     band around w_d * total (up to the cap),
  *   - weight monotonicity: raising one domain's weight never DROPS a
  *     previously kept copy of that domain (nested-samples contract).
  */
class MixingPropSpec extends SparkSpec {

  import spark.implicits._

  private val corpusGen = for {
    nDomains <- Gen.choose(2, 5)
    docsPerDomain <- Gen.listOfN(nDomains, Gen.choose(1, 40))
    unitSeed <- Gen.choose(1, 200)
  } yield {
    val rows = for {
      (nd, d) <- docsPerDomain.zipWithIndex
      i <- 0 until nd
    } yield (d.toLong * 1000 + i, s"dom$d", (unitSeed + (i * 37) % 160 + 20).toLong)
    rows
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def weightsFor(domains: Seq[String], seed: Long): Map[String, Double] = {
    val raw = domains.zipWithIndex.map { case (d, i) =>
      d -> (1.0 + ((seed + i * 13) % 7).toDouble)
    }
    val tot = raw.map(_._2).sum
    raw.map { case (d, v) => d -> v / tot }.toMap
  }

  test("copy counts are floor(r) or ceil(r) for random corpora and weights") {
    for (seed <- 1L to 5L) {
      val rows = sample(corpusGen, seed)
      val df = rows.toDF("id", "dom", "units")
      val w = weightsFor(rows.map(_._2).distinct, seed)
      val total = rows.map(_._3).sum.toDouble
      val byDomUnits = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
      val out = Mixing.mixToWeights(df, "dom", "id", "units", w)
        .groupBy("dom", "id").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // docs that emitted: n in {floor(r), ceil(r)} (n = 0 rows don't appear)
      out.foreach { case (dom, _, n) =>
        val r = math.min(w(dom) * total / byDomUnits(dom), 16.0)
        assert(n == math.floor(r).toLong || n == math.ceil(r).toLong,
          s"seed=$seed dom=$dom n=$n r=$r")
      }
      // total emissions per domain sit in the [floor(r), ceil(r)] * nDocs
      // band (every doc emits floor(r) or ceil(r) times)
      val massByDom = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      rows.map(_._2).distinct.foreach { dom =>
        val r = math.min(w(dom) * total / byDomUnits(dom), 16.0)
        val nDocs = rows.count(_._2 == dom)
        val copies = massByDom.getOrElse(dom, 0L)
        assert(copies >= math.floor(r).toLong * nDocs &&
          copies <= math.ceil(r).toLong * nDocs,
          s"seed=$seed dom=$dom copies=$copies r=$r nDocs=$nDocs")
      }
    }
  }

  test("raising one domain's weight keeps every previously kept copy (nested samples)") {
    val rows = sample(corpusGen, 42L)
    val df = rows.toDF("id", "dom", "units")
    val doms = rows.map(_._2).distinct
    val w1 = weightsFor(doms, 42L)
    // bump the first domain by 30% (weights need not sum to 1 for the
    // operator; r scales linearly in w_d)
    val w2 = w1.updated(doms.head, w1(doms.head) * 1.3)
    def copies(w: Map[String, Double]) =
      Mixing.mixToWeights(df, "dom", "id", "units", w)
        .filter(col("dom") === doms.head)
        .select("id", "copy_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    val before = copies(w1)
    val after = copies(w2)
    assert(before.subsetOf(after),
      s"lost copies on weight bump: ${before.diff(after)}")
  }
}
