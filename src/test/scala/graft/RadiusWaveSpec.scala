package graft

import org.apache.spark.sql.functions._

/** Fixture + brute-force cross-checks for the round-16 wave:
  * q_join_radius_grid (ops.RadiusJoin), q_agg_gini, q_merge_erase.
  */
class RadiusWaveSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("radius grid join: hand-built neighbors, boundary pairs, negative coords") {
    import spark.implicits._
    // r = 5; qualifying pairs (dist^2 <= 25): 1-2 at exactly 25
    // (inclusive boundary, different cells), 1-4 at 2 (cross-origin,
    // adjacent cells across the sign change), 4-5 at exactly 25
    // (all-negative coordinates); 1-5 at 41 and 2-4 at 41 must NOT pair;
    // 3 is isolated
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 4L), (3L, 100L, 100L),
      (4L, -1L, -1L), (5L, -4L, -5L))
      .toDF("id", "x", "y").withColumn("r", lit(5L))
    val out = graft.ops.RadiusJoin.neighborDigestWithR(pts)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out(1L) == (2L, Some(2L)), s"p1: ${out(1L)}")
    assert(out(2L) == (1L, Some(25L)))
    assert(out(3L) == (0L, None), "far point must be isolated with null nn_dist2")
    assert(out(4L) == (2L, Some(2L)), "negative-coordinate pairs must band correctly")
    assert(out(5L) == (1L, Some(25L)))
  }

  test("radius grid join: catalog query equals brute force at sf0.001") {
    val out = SparkEntry.queries("q_join_radius_grid")(spark, sf001).collect()
    assert(out.length > 0)
    val pts = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // re-derive r exactly as the query does
    val n = pts.length.toLong
    val w = pts.map(_._2).max - pts.map(_._2).min
    val h = pts.map(_._3).max - pts.map(_._3).min
    val r = math.max(1L, math.ceil(math.sqrt((w * h).toDouble / n)).toLong)
    val brute = pts.map { case (id, x, y) =>
      val ds = for {
        (id2, x2, y2) <- pts if id2 != id
        d2 = (x - x2) * (x - x2) + (y - y2) * (y - y2) if d2 <= r * r
      } yield d2
      id -> ((ds.length.toLong, if (ds.isEmpty) None else Some(ds.min)))
    }.toMap
    out.foreach { row =>
      val got = (row.getLong(3), Option(row.get(4)).map(_.asInstanceOf[Long]))
      assert(got == brute(row.getLong(0)),
        s"point ${row.getLong(0)}: $got != brute ${brute(row.getLong(0))}")
    }
    assert(out.map(_.getLong(3)).sum > 0, "sf0.001 should have some neighbors")
  }

  test("gini: hand-computed closed form and degenerate equality") {
    // [1, 3] ascending: sum(i*x) = 1*1 + 2*3 = 7; N = 2*7 - 3*4 = 2;
    // D = 2*4 = 8 -> G = 0.25 -> 250000 ppm. [2, 2, 2]: G = 0.
    val out = SparkEntry.queries("q_agg_gini")(spark, sf001).collect()
    assert(out.length == 5, "five order priorities")
    // cross-check every group against a plain-Scala brute force
    val rows = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100d + 0.5d).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byP = rows.groupBy(_._1)
    out.foreach { r =>
      val xs = byP(r.getString(0)).map(_._2).sorted
      val n = BigInt(xs.length); val s = xs.map(BigInt(_)).sum
      val ixs = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val expected = ((ixs * 2 - (n + 1) * s) * 1000000) / (n * s)
      assert(BigInt(r.getLong(3)) == expected,
        s"${r.getString(0)}: gini ${r.getLong(3)} != $expected")
      assert(r.getLong(1) == xs.length && r.getLong(2) == xs.map(BigInt(_)).sum)
    }
  }

  test("merge erase: cascade counts equal brute force; zero-order subjects report zeros") {
    val out = SparkEntry.queries("q_merge_erase")(spark, sf001).collect()
    assert(out.length > 0, "deletion list must be non-empty at sf0.001")
    val custs = spark.read.parquet(s"$sf001/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).filter(_ % 97 == 0).toSet
    assert(out.map(_.getLong(0)).toSet == custs, "one row per erased subject")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val purged = orders.filter(o => custs(o._2))
    val items = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100d + 0.5d).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pk = purged.map(_._1).toSet
    out.foreach { r =>
      val k = r.getLong(0)
      val myOrders = purged.filter(_._2 == k).map(_._1).toSet
      val myItems = items.filter(i => myOrders(i._1))
      assert(r.getLong(1) == myOrders.size, s"cust $k orders")
      assert(r.getLong(2) == myItems.length, s"cust $k items")
      assert(r.getLong(3) == myItems.map(_._2).sum, s"cust $k refund")
    }
    assert(pk.nonEmpty, "fixture should actually cascade at sf0.001")
  }
}
