package graft

import graft.ops.Mixing
import org.apache.spark.sql.functions._

/** Invariants of the domain-mixing operator (ops.Mixing). */
class MixingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    // domain "a": 4 docs x 100 units; domain "b": 2 docs x 100; "c": 1 doc
    (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L), (4L, "a", 100L),
    (5L, "b", 100L), (6L, "b", 100L),
    (7L, "c", 100L)
  ).toDF("id", "dom", "units")

  test("per-document copy counts are floor(r) or ceil(r)") {
    // weights: a 0.5 (r = 0.5*700/400 = 0.875), b 0.3 (r = 1.05), c 0.2 (r = 1.4)
    val out = Mixing.mixToWeights(corpus, "dom", "id", "units",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val copies = out.groupBy("dom", "id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val byDom = copies.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // r_a = 0.875: every a-doc appears 0 or 1 times
    assert(byDom.getOrElse("a", Seq()).forall(n => n == 1L))
    assert(byDom.getOrElse("a", Seq()).size <= 4)
    // r_b = 1.05: every b-doc appears 1 or 2 times
    assert(byDom("b").forall(n => n == 1L || n == 2L))
    // r_c = 1.4: the single c-doc appears 1 or 2 times
    assert(byDom("c").forall(n => n == 1L || n == 2L))
    // copy_idx is 1..n per doc (each (doc, epoch) row distinct)
    val maxIdx = out.groupBy("id").agg(max("copy_idx").as("m"), count(lit(1)).as("n"))
      .filter(col("m") =!= col("n")).count()
    assert(maxIdx == 0, "copy_idx must enumerate 1..n_copies per document")
  }

  test("deterministic: identical output under different partitioning") {
    val w = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val one = Mixing.mixToWeights(corpus.repartition(1), "dom", "id", "units", w)
      .select("id", "copy_idx").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val eight = Mixing.mixToWeights(corpus.repartition(8), "dom", "id", "units", w)
      .select("id", "copy_idx").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(one == eight && one.nonEmpty)
  }

  test("epochCap bounds amplification of a scarce domain") {
    // c holds 1/7 of units but is asked for 90% of the mix: uncapped
    // r_c = 0.9*700/100 = 6.3; with epochCap=2 every c-doc appears <= 2 times
    val out = Mixing.mixToWeights(corpus, "dom", "id", "units",
      Map("a" -> 0.05, "b" -> 0.05, "c" -> 0.9), epochCap = 2)
    val cCopies = out.filter(col("dom") === "c").groupBy("id")
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(1))
    assert(cCopies.forall(_ <= 2L))
  }

  test("domains absent from the weight map are dropped") {
    val out = Mixing.mixToWeights(corpus, "dom", "id", "units",
      Map("a" -> 1.0))
    assert(out.filter(col("dom") =!= "a").count() == 0)
    assert(out.filter(col("dom") === "a").count() > 0)
  }

  test("achieved unit share tracks the target on a real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Map("en" -> 0.25, "de" -> 0.25, "es" -> 0.20, "fr" -> 0.20, "zh" -> 0.10)
    val out = Mixing.mixToWeights(docs, "lang", "doc_id", "n_chars", w)
    val total = out.agg(sum("n_chars")).head().getLong(0).toDouble
    val shares = out.groupBy("lang").agg(sum("n_chars").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / total).toMap
    // hash acceptance is exact in expectation; on ~500 docs the realized
    // share sits within a couple points of target
    w.foreach { case (lang, target) =>
      val got = shares.getOrElse(lang, 0.0)
      assert(math.abs(got - target) < 0.04,
        s"$lang: target $target, achieved $got")
    }
  }

  test("temperature mixture flattens the head: r scales monotonically against size") {
    // units: a 400, b 200, c 100 (total 700). alpha=0.5 masses are
    // sqrt-proportional (20:14.1:10), so r_c > r_b > r_a and the scarce
    // domain is up-weighted while the abundant one is down-weighted —
    // bracketing r analytically: r_a = (20/44.1)*700/400 ~ 0.79,
    // r_b ~ 1.12, r_c ~ 1.59
    val out = Mixing.mixToTemperature(corpus, "dom", "id", "units")
    val copies = out.groupBy("dom").agg(
      count(lit(1)).cast("double").as("rows_out"),
      countDistinct("id").cast("double").as("docs_in"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // realized copies per doc land on floor/ceil of r
    val perDoc = out.groupBy("dom", "id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    perDoc.foreach {
      case ("a", n) => assert(n == 1L, s"r_a~0.79: 0 or 1 copies, got $n")
      case ("b", n) => assert(n == 1L || n == 2L, s"r_b~1.12: got $n")
      case ("c", n) => assert(n == 1L || n == 2L, s"r_c~1.59: got $n")
      case other => fail(s"unexpected domain row: $other")
    }
    assert(copies.contains("c"), "scarce domain must survive the mixture")
  }

  test("temperature mixture is deterministic across partitionings") {
    val one = Mixing.mixToTemperature(corpus.repartition(1), "dom", "id", "units")
      .select("id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val eight = Mixing.mixToTemperature(corpus.repartition(8), "dom", "id", "units")
      .select("id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(one == eight && one.nonEmpty)
  }

  test("plan shape: both side tables arrive broadcast, replication is map-side") {
    val out = Mixing.mixToWeights(corpus, "dom", "id", "units",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "domain stats must broadcast, not shuffle the corpus")
  }
}
