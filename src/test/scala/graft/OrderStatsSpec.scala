package graft

import graft.ops.OrderStats
import graft.ops.OrderStats.Quantile
import org.apache.spark.sql.functions._

/** Exact histogram-bisection order statistics: agreement with the sorted
  * truth at every requested rank, duplicate-heavy and negative domains,
  * convergence on wide value ranges, and the bounded-driver-state
  * contract (counter-cell histogram, never a row collect). */
class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(Quantile("p00", 0, 1), Quantile("p25", 1, 4),
    Quantile("p50", 1, 2), Quantile("p75", 3, 4), Quantile("p100", 1, 1))

  private def truth(vals: Seq[Long]): Map[String, Long] = {
    val sorted = vals.sorted
    val n = sorted.length.toLong
    qs.map(q => q.stat -> sorted(((n - 1) * q.num / q.den).toInt)).toMap
  }

  private def run(vals: Seq[Long], bins: Int = 16): Map[String, Long] =
    OrderStats.quantilesDisc(vals.toDF("v"), "v", qs, bins = bins)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("agrees with the sorted truth on a shuffled wide-range input") {
    val vals = new scala.util.Random(7)
      .shuffle((1 to 5000).map(i => (i.toLong * 2654435761L) % 1000000007L))
    assert(run(vals) == truth(vals))
  }

  test("duplicate-heavy multiset: ranks land inside duplicate runs") {
    val vals = Seq.fill(400)(10L) ++ Seq.fill(300)(20L) ++
      Seq.fill(5)(-3L) ++ Seq.fill(295)(20L) // 1000 values, 3 distinct
    assert(run(vals) == truth(vals))
  }

  test("negative and mixed-sign domains") {
    val vals = new scala.util.Random(3)
      .shuffle((-2500 to 2500).map(_.toLong * 13))
    assert(run(vals) == truth(vals))
  }

  test("tiny inputs: n = 1 and n = 2") {
    assert(run(Seq(42L)) == qs.map(_.stat -> 42L).toMap)
    val two = run(Seq(9L, 5L))
    assert(two == truth(Seq(9L, 5L)))
  }

  test("converges on a 2^40-wide domain with small bins") {
    val vals = new scala.util.Random(5)
      .shuffle((1 to 2000).map(i => (i.toLong * 549755813881L) % (1L << 40)))
    assert(run(vals, bins = 64) == truth(vals))
  }

  test("nulls are ignored; all-null input refuses loudly") {
    val withNulls = spark.range(100)
      .select(when(col("id") % 3 === 0, col("id")).as("v"))
    val expect = (0L until 100L).filter(_ % 3 == 0)
    val got = OrderStats.quantilesDisc(withNulls, "v", qs, bins = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == truth(expect))
    val err = intercept[IllegalArgumentException] {
      OrderStats.quantilesDisc(
        spark.range(5).select(lit(null).cast("long").as("v")), "v", qs)
    }
    assert(err.getMessage.contains("no non-null rows"))
  }

  test("out-of-range quantiles and duplicate labels are rejected") {
    intercept[IllegalArgumentException] {
      Quantile("bad", 5, 4)
    }
    intercept[IllegalArgumentException] {
      OrderStats.quantilesDisc(Seq(1L).toDF("v"), "v",
        Seq(Quantile("a", 1, 2), Quantile("a", 1, 4)))
    }
  }

  test("quantilesDiscMulti equals per-column quantilesDisc, incl. overlapping value ranges") {
    // three columns with deliberately OVERLAPPING value spaces and
    // different shapes (the r16 fused-fit path must keep per-column
    // brackets independent even when value ranges coincide)
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(500)((
      rnd.nextInt(1000).toLong,
      (rnd.nextInt(40) + 5).toLong,
      rnd.nextInt(1000).toLong * rnd.nextInt(3)))
    val df = rows.toDF("a", "b", "c")
    val got = OrderStats.quantilesDiscMulti(df, Seq("a", "b", "c"), qs,
      bins = 16)
    for (c <- Seq("a", "b", "c")) {
      val want = OrderStats.quantilesDisc(df.select(c), c, qs, bins = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got(c) == want, s"column $c: fused != per-column")
    }
  }
}
