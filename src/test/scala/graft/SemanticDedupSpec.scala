package graft

import graft.ops.{SemanticDedup, Similarity}
import org.apache.spark.sql.graft.CosineSimilarity.cosine_sim
import org.apache.spark.sql.functions._

/** Invariant contract for the rows-only `q_dedup_semantic` entry:
  * planted semantic duplicates drop (min id kept), dissimilar vectors
  * survive, the verdict covers the whole corpus, and the decision is
  * deterministic across runs. */
class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  // Two well-separated directions in 8-dim space; clones are exact copies
  // (cos = 1 > any threshold), "far" vectors are orthogonal to everything.
  private val dirA = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val dirB = Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val dirC = Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
  private val dirD = Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)

  private def run(rows: Seq[(Long, Array[Float])], k: Int) =
    SemanticDedup.dedup(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = k, threshold = 0.8, chunks = 2,
        sim = (x, y) => cosine_sim(x, y))
      .orderBy("vec_id")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("dropped"))
      .toSeq

  test("planted clone groups collapse to their min id; singletons survive") {
    val rows = Seq(
      1L -> dirA, 2L -> dirA, 5L -> dirA, // clone group: keep 1, drop 2 & 5
      3L -> dirB, 4L -> dirB,             // clone group: keep 3, drop 4
      6L -> dirC, 7L -> dirD)             // orthogonal singletons: kept
    val out = run(rows, k = 2)
    val dropped = out.filter(_._2).map(_._1).toSet
    val kept = out.filterNot(_._2).map(_._1).toSet
    // exact-clone groups always share a k-means cluster (distance 0), so
    // the verdicts are partitioning-independent
    assert(dropped == Set(2L, 4L, 5L), s"dropped=$dropped")
    assert(kept == Set(1L, 3L, 6L, 7L), s"kept=$kept")
  }

  test("pairwise-dissimilar corpus keeps everything at any k") {
    val rows = Seq(1L -> dirA, 2L -> dirB, 3L -> dirC, 4L -> dirD)
    for (k <- Seq(2, 3)) {
      val out = run(rows, k)
      assert(out.forall(!_._2), s"k=$k over-dropped: $out")
    }
  }

  test("verdict covers the full corpus exactly once and is deterministic") {
    val rows = Seq(1L -> dirA, 2L -> dirA, 3L -> dirB, 4L -> dirC)
    val a = run(rows, k = 2)
    val b = run(rows, k = 2)
    assert(a.map(_._1) == Seq(1L, 2L, 3L, 4L), "one verdict per vector")
    assert(a == b, "semantic dedup must be deterministic across runs")
  }

  test("one-pass rule: only docs with an over-threshold SMALLER neighbor drop") {
    // star around id 3: vectors 1 and 2 sit 60 degrees apart
    // (cos = 0.5 < 0.8); 3 is their normalized midpoint, cos = 0.866 to
    // BOTH. CC keep-min would collapse all three to component 1 and drop
    // 2; the one-pass rule keeps 1 AND 2 (no smaller over-threshold
    // neighbor) and drops only 3.
    val sixty = Array(0.5f, 0.8660254f, 0f, 0f, 0f, 0f, 0f, 0f)
    val mid = Array(0.8660254f, 0.5f, 0f, 0f, 0f, 0f, 0f, 0f)
    val rows = Seq(1L -> dirA, 2L -> sixty, 3L -> mid)
    val df = rows.toDF("vec_id", "embedding")
    // sanity: the geometry is what the comment claims
    val sims = Similarity.thresholdPairs(
        df.withColumn("cluster", lit(0)), "cluster", "vec_id", "embedding",
        0.8, 2, (x, y) => cosine_sim(x, y))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sims == Set((1L, 3L), (2L, 3L)), s"geometry drifted: $sims")
    // the rule is tested on a FIXED single block (dedupAssigned) so the
    // outcome cannot depend on which stable k-means split the init lands
    // in — {1,2}|{3} is a legitimate fixed point that would hide the pair
    val out = SemanticDedup.dedupAssigned(
        df.withColumn("cluster", lit(0)), "vec_id", "embedding",
        threshold = 0.8, chunks = 2, sim = (x, y) => cosine_sim(x, y))
      .orderBy("vec_id").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("dropped")).toSeq
    assert(out == Seq(1L -> false, 2L -> false, 3L -> true), s"got $out")
  }

  test("nearestCentroid: argmin assignment, smallest cluster id on ties") {
    // centroids on two axes; points nearer one, the other, or equidistant
    val cents = Seq(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val rows = Seq(
      10L -> Array(0.9f, 0.1f, 0f, 0f),  // nearest centroid 0
      11L -> Array(0.1f, 0.9f, 0f, 0f),  // nearest centroid 1
      12L -> Array(0.5f, 0.5f, 0f, 0f))  // exactly equidistant -> 0
    val out = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        SemanticDedup.nearestCentroid(col("embedding"), cents).as("cluster"))
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(out == Seq(10L -> 0, 11L -> 1, 12L -> 0), s"got $out")
  }

  test("nearestCentroid agrees with a driver-side argmin on fitted centroids") {
    // the oracle-replayable assignment must BE the nearest-centroid rule:
    // compare the expression against a plain Scala argmin over the same
    // fitted centroids, same fold order, for every planted vector
    val rows = Seq(1L -> dirA, 2L -> dirA, 3L -> dirB, 4L -> dirB,
      5L -> dirC, 6L -> dirD)
    val df = rows.toDF("vec_id", "embedding")
    val cents = SemanticDedup.fitCentroids(df, "embedding", k = 3)
    val got = df.select(col("vec_id"),
        SemanticDedup.nearestCentroid(col("embedding"), cents).as("cluster"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { case (id, emb) =>
      val dists = cents.map(c =>
        emb.map(_.toDouble).zip(c).foldLeft(0.0) { case (s, (a, b)) =>
          s + (a - b) * (a - b) })
      val want = dists.indexOf(dists.min) // first index wins ties
      assert(got(id) == want, s"vec $id: expr ${got(id)} vs argmin $want")
    }
  }

  test("nearestCentroidDist carries the winning squared distance exactly") {
    val cents = Seq(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val rows = Seq(10L -> Array(0.9f, 0.1f, 0f, 0f),
      11L -> Array(0.1f, 0.9f, 0f, 0f))
    val out = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        SemanticDedup.nearestCentroidDist(col("embedding"), cents).as("a"))
      .select(col("vec_id"), col("a.d"), col("a.c"))
      .orderBy("vec_id").as[(Long, Double, Int)].collect().toSeq
    rows.zip(out).foreach { case ((id, emb), (gid, gd, gc)) =>
      val dists = cents.map(c =>
        emb.map(_.toDouble).zip(c).foldLeft(0.0) { case (s, (a, b)) =>
          s + (a - b) * (a - b) })
      assert(gid == id && gc == dists.indexOf(dists.min) && gd == dists.min,
        s"vec $id: got ($gd, $gc), want (${dists.min}, ${dists.indexOf(dists.min)})")
    }
  }
}
