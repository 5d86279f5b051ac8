package graft

import graft.ops.{Merge, RangeJoin}
import org.apache.spark.sql.functions._

/** Semantics of the batch MERGE/upsert and the binned range join — both
  * verified against first-principles expectations, the range join also
  * against the naive inequality join it replaces. */
class MergeRangeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert updates matched rows, inserts new rows, passes the rest through") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val delta = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val out = Merge.upsert(base, delta, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "B", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert applies a matched delta row wholesale, including its nulls") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val delta = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    val out = Merge.upsert(base, delta, Seq("k")).collect()
    // MERGE "update set *": the delta row replaces the base row entirely,
    // so a null delta value overwrites — it is not a per-column patch
    assert(out.length == 1 && out.head.isNullAt(1))
  }

  test("scd2Apply: changed rows close+reopen, no-ops don't grow history, new entities insert, history passes through") {
    val eot = 253402300799L
    // entity 1: will change; entity 2: identical update (no-op); entity 3:
    // untouched; entity 4 already has a CLOSED historical version that must
    // pass through byte-identical
    val dim = Seq(
      (1L, "red", 0L, eot),
      (2L, "blue", 0L, eot),
      (3L, "green", 0L, eot),
      (4L, "old", 0L, 500L), (4L, "new", 500L, eot))
      .toDF("k", "color", "valid_from", "valid_to")
    val updates = Seq((1L, "crimson"), (2L, "blue"), (9L, "white"))
      .toDF("k", "color")
    val out = Merge.scd2Apply(dim, updates, "k", Seq("color"),
        "valid_from", "valid_to", batchTs = 1000L)
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "red", 0L, 1000L), (1L, "crimson", 1000L, eot), // closed + reopened
      (2L, "blue", 0L, eot),                               // no-op: one row only
      (3L, "green", 0L, eot),                              // untouched passthrough
      (4L, "old", 0L, 500L), (4L, "new", 500L, eot),       // history intact
      (9L, "white", 1000L, eot)))                          // new entity
  }

  test("scd2Apply is idempotent across repeated batches and accretes history across distinct ones") {
    val eot = 253402300799L
    val dim0 = Seq((1L, "v1", 0L, eot)).toDF("k", "attr", "valid_from", "valid_to")
    val b1 = Seq((1L, "v2")).toDF("k", "attr")
    val once = Merge.scd2Apply(dim0, b1, "k", Seq("attr"), "valid_from", "valid_to", 100L)
    // replaying the SAME batch on the applied result changes nothing: the
    // current row already carries v2, so the update is a no-op
    val twice = Merge.scd2Apply(once, b1, "k", Seq("attr"), "valid_from", "valid_to", 200L)
    assert(twice.orderBy("valid_from").as[(Long, String, Long, Long)].collect().toSeq
      == Seq((1L, "v1", 0L, 100L), (1L, "v2", 100L, eot)))
    // a later batch with a new value adds exactly one more version
    val b2 = Seq((1L, "v3")).toDF("k", "attr")
    val grown = Merge.scd2Apply(twice, b2, "k", Seq("attr"), "valid_from", "valid_to", 300L)
    assert(grown.orderBy("valid_from").as[(Long, String, Long, Long)].collect().toSeq
      == Seq((1L, "v1", 0L, 100L), (1L, "v2", 100L, 300L), (1L, "v3", 300L, eot)))
  }

  test("binned range join matches the naive inequality join exactly") {
    // intervals of varying length, some spanning multiple bins; points on
    // boundaries to pin the [start, end) inclusivity contract
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 35L), (3L, 100L, 101L))
      .toDF("iv_id", "s_raw", "e_raw")
      .select(col("iv_id"), col("s_raw").cast("timestamp").as("s"),
        col("e_raw").cast("timestamp").as("e"))
    val pts = Seq((10L, 0L), (11L, 9L), (12L, 10L), (13L, 34L), (14L, 35L),
      (15L, 100L), (16L, 101L), (17L, 20L))
      .toDF("pt_id", "t_raw")
      .select(col("pt_id"), col("t_raw").cast("timestamp").as("t"))
    val binned = RangeJoin.pointInInterval(pts, "t", iv, "s", "e", binSeconds = 8L)
      .select("iv_id", "pt_id").orderBy("iv_id", "pt_id")
      .as[(Long, Long)].collect().toSeq
    val naive = pts.join(iv, col("t") >= col("s") && col("t") < col("e"))
      .select("iv_id", "pt_id").orderBy("iv_id", "pt_id")
      .as[(Long, Long)].collect().toSeq
    assert(binned == naive)
    // start inclusive (pt 10 in iv 1), end exclusive (pt 12 not in iv 1;
    // pt 14 not in iv 2), multi-bin interval catches interior point (17)
    assert(binned == Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L),
      (2L, 13L), (2L, 17L), (3L, 15L)))
  }

  test("adaptive bin width: identical results, near-floor candidates, sane fallbacks") {
    // same planted data as the exact-match test above
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 35L), (3L, 100L, 101L))
      .toDF("iv_id", "s_raw", "e_raw")
      .select(col("iv_id"), col("s_raw").cast("timestamp").as("s"),
        col("e_raw").cast("timestamp").as("e"))
    val pts = Seq((10L, 0L), (11L, 9L), (12L, 10L), (13L, 34L), (14L, 35L),
      (15L, 100L), (16L, 101L), (17L, 20L))
      .toDF("pt_id", "t_raw")
      .select(col("pt_id"), col("t_raw").cast("timestamp").as("t"))
    val adaptive = RangeJoin.pointInIntervalAdaptive(pts, "t", iv, "s", "e")
      .select("iv_id", "pt_id").orderBy("iv_id", "pt_id")
      .as[(Long, Long)].collect().toSeq
    val fixed = RangeJoin.pointInInterval(pts, "t", iv, "s", "e", binSeconds = 8L)
      .select("iv_id", "pt_id").orderBy("iv_id", "pt_id")
      .as[(Long, Long)].collect().toSeq
    assert(adaptive == fixed, "bin width must never change join semantics")
    // on the real corpus: the derived width beats (or ties) the historic
    // constant-week width on candidate volume — the quantity the shuffle
    // and the exact recheck actually pay for
    val dir = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("s"),
        (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("e"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_shipdate")
    val b = RangeJoin.adaptiveBinSeconds(li, "l_shipdate", o, "s", "e")
    val week = 7L * 86400
    assert(b >= 1L && b <= week, s"derived width $b outside (0, W]")
    val cAdaptive = RangeJoin.candidates(li, "l_shipdate", o, "s", "e", b).count()
    val cWeek = RangeJoin.candidates(li, "l_shipdate", o, "s", "e", week).count()
    val matches = RangeJoin.pointInInterval(li, "l_shipdate", o, "s", "e", b).count()
    assert(cAdaptive <= cWeek,
      s"adaptive width produced MORE candidates ($cAdaptive) than week bins ($cWeek)")
    assert(cAdaptive >= matches, "candidates can never undercut true matches")
    // degenerate inputs fall back instead of dividing by zero
    val empty = pts.where(lit(false))
    assert(RangeJoin.adaptiveBinSeconds(empty, "t", iv, "s", "e", 123L) == 123L)
    val zeroLen = iv.select(col("iv_id"), col("s"), col("s").as("e"))
    assert(RangeJoin.adaptiveBinSeconds(pts, "t", zeroLen, "s", "s", 123L) == 123L)
    val oneInstant = pts.where(col("pt_id") === 10L)
    assert(RangeJoin.adaptiveBinSeconds(oneInstant, "t", iv, "s", "e", 123L) == 123L)
  }

  test("upsert handles composite keys and an empty delta") {
    val base = Seq((1L, "x", 10.0), (1L, "y", 20.0)).toDF("k1", "k2", "v")
    val delta = Seq((1L, "y", 99.0)).toDF("k1", "k2", "v")
    val out = Merge.upsert(base, delta, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "x", 10.0), (1L, "y", 99.0)))
    val noop = Merge.upsert(base, delta.limit(0), Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, String, Double)].collect()
    assert(noop.toSeq == Seq((1L, "x", 10.0), (1L, "y", 20.0)))
  }

  test("malformed intervals (end before start) match nothing") {
    // sequence() infers a descending step for end<start, so the interval
    // explodes onto bins — but the exact [start, end) recheck is vacuously
    // false, so a malformed interval contributes zero matches
    val iv = Seq((1L, 100L, 50L)).toDF("iv_id", "s_raw", "e_raw")
      .select(col("iv_id"), col("s_raw").cast("timestamp").as("s"),
        col("e_raw").cast("timestamp").as("e"))
    val pts = Seq((10L, 75L)).toDF("pt_id", "t_raw")
      .select(col("pt_id"), col("t_raw").cast("timestamp").as("t"))
    assert(RangeJoin.pointInInterval(pts, "t", iv, "s", "e", binSeconds = 8L)
      .count() == 0)
  }

  test("connected components of an empty edge list is empty, not an error") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.ops.Components.connectedComponents(edges, "a", "b").count() == 0)
  }

  test("upsert refuses a delta missing base columns instead of silently dropping them") {
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val delta = Seq((1L, 99.0)).toDF("k", "v") // no "name"
    val e = intercept[IllegalArgumentException](graft.ops.Merge.upsert(base, delta, Seq("k")))
    assert(e.getMessage.contains("name"))
  }

  test("upsert column guard matches the session's case-insensitive resolution") {
    // Spark resolves columns case-insensitively by default; the guard must
    // accept a delta the join would resolve fine
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val delta = Seq((1L, "b", 99.0)).toDF("K", "NAME", "V")
    val out = graft.ops.Merge.upsert(base, delta, Seq("k")).collect()
    assert(out.length == 1 && out.head.getString(1) == "b")
  }

  test("boundary sweep matches pair join + count exactly, incl. half-open ties") {
    // iv 1: [0,10)  — point at 0 counted (start inclusive), at 10 not
    // iv 2: [5,35)  — end-exclusive tie at 35
    // iv 3: [100,101) — one interior point
    // iv 4: [200,210) — no points: dropped (inner-join semantics)
    // iv 5: [40,40) — empty interval: dropped
    // iv 6: [50,45) — malformed (end < start): dropped
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 35L), (3L, 100L, 101L),
      (4L, 200L, 210L), (5L, 40L, 40L), (6L, 50L, 45L))
      .toDF("iv_id", "s_raw", "e_raw")
      .select(col("iv_id"), col("s_raw").cast("timestamp").as("s"),
        col("e_raw").cast("timestamp").as("e"))
    val pts = Seq((10L, 0L), (11L, 9L), (12L, 10L), (13L, 34L), (14L, 35L),
      (15L, 100L), (16L, 101L), (17L, 20L))
      .toDF("pt_id", "t_raw")
      .select(col("pt_id"), col("t_raw").cast("timestamp").as("t"))
    val swept = RangeJoin.countPerInterval(pts.select("t"), "t", iv,
        Seq("iv_id"), "s", "e", countCol = "n")
      .orderBy("iv_id").as[(Long, Long)].collect().toSeq
    val paired = RangeJoin.pointInInterval(pts, "t", iv, "s", "e",
        binSeconds = 8L)
      .groupBy("iv_id").agg(count(lit(1)).as("n"))
      .orderBy("iv_id").as[(Long, Long)].collect().toSeq
    assert(swept == paired, "sweep must agree with the pair join")
    assert(swept == Seq((1L, 2L), (2L, 4L), (3L, 1L)))
  }

  test("boundary sweep agrees with the pair join on the real corpus at every shard count") {
    val dir = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("s"),
        (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("e"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_shipdate")
    val expected = RangeJoin.pointInIntervalAdaptive(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select("l_orderkey", "l_shipdate"), "l_shipdate", o, "s", "e")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .orderBy("o_orderkey").as[(Long, Long)].collect().toSeq
    // shard count is a parallelism knob, never a semantics knob: a
    // single shard (one global cumsum) and a shard per few seconds must
    // return identical counts
    for (shards <- Seq(1, 7, 256)) {
      val swept = RangeJoin.countPerInterval(li, "l_shipdate", o,
          Seq("o_orderkey"), "s", "e", countCol = "n", nShards = shards)
        .orderBy("o_orderkey").as[(Long, Long)].collect().toSeq
      assert(swept == expected, s"sweep at nShards=$shards diverged")
    }
  }

  test("weighted sweep matches pair join + sum, incl. ties, null weights, negatives") {
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 35L), (3L, 100L, 101L),
      (4L, 200L, 210L))
      .toDF("iv_id", "s_raw", "e_raw")
      .select(col("iv_id"), col("s_raw").cast("timestamp").as("s"),
        col("e_raw").cast("timestamp").as("e"))
    // weights: boundary-tie points carry distinct weights; one null weight
    // (counts toward n, adds 0); one NEGATIVE weight (the F-difference is
    // exact signed long math — no positivity assumption)
    val pts = Seq((0L, Some(5L)), (9L, Some(7L)), (10L, Some(11L)),
      (34L, None), (35L, Some(13L)), (100L, Some(-3L)), (20L, Some(17L)))
      .toDF("t_raw", "w")
      .select(col("t_raw").cast("timestamp").as("t"), col("w"))
    val swept = RangeJoin.sumPerInterval(pts, "t", col("w"), iv,
        Seq("iv_id"), "s", "e", sumCol = "ws", countCol = "n")
      .orderBy("iv_id").as[(Long, Long, Long)].collect().toSeq
    val paired = RangeJoin.pointInInterval(pts, "t", iv, "s", "e", 8L)
      .groupBy("iv_id").agg(count(lit(1)).as("n"), sum("w").as("ws"))
      .orderBy("iv_id").as[(Long, Long, Long)].collect().toSeq
    assert(swept == paired, "weighted sweep must agree with the pair join")
    // iv1 [0,10): pts 0(w5), 9(w7) -> n=2 ws=12
    // iv2 [5,35): pts 9(w7), 10(w11), 20(w17), 34(null) -> n=4 ws=35
    // iv3 [100,101): pt 100(w-3) -> n=1 ws=-3
    assert(swept == Seq((1L, 2L, 12L), (2L, 4L, 35L), (3L, 1L, -3L)))
  }

  test("pairs-below sweep matches the inequality join, incl. ties, nulls, empty groups") {
    // group 1: values with a tie (strict > must exclude it); group 2:
    // left value below every right value (zero pairs -> dropped); group
    // 3: right side empty (dropped); nulls on both sides qualify nothing
    val sup = Seq((1L, 10.0), (1L, 5.0), (2L, 1.0), (3L, 7.0))
      .toDF("nk", "sv")
      .unionByName(Seq((1L, Option.empty[Double])).toDF("nk", "sv"))
    val cust = Seq((1L, 5.0), (1L, 9.0), (1L, 12.0), (2L, 2.0))
      .toDF("nk", "cv")
      .unionByName(Seq((2L, Option.empty[Double])).toDF("nk", "cv"))
    val swept = RangeJoin.countPairsBelow(sup, "sv", cust, "cv", Seq("nk"))
      .orderBy("nk").as[(Long, Long)].collect().toSeq
    val naive = sup.join(cust, sup("nk") === cust("nk") && col("sv") > col("cv"))
      .groupBy(sup("nk")).agg(count(lit(1)).as("n"))
      .orderBy(sup("nk")).as[(Long, Long)].collect().toSeq
    assert(swept == naive, "sweep must agree with the pair join")
    // group 1: sup 10 beats cust {5, 9} = 2; sup 5 beats none (tie at 5
    // excluded) = 0 -> total 2. groups 2 and 3 drop.
    assert(swept == Seq((1L, 2L)))
  }

  test("pairs-below sweep agrees with the inequality join on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_nationkey").as("nk"), col("s_acctbal"))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey").as("nk"), col("c_acctbal"))
    val swept = RangeJoin.countPairsBelow(sup, "s_acctbal", cust,
        "c_acctbal", Seq("nk"))
      .orderBy("nk").as[(Long, Long)].collect().toSeq
    val naive = sup.join(cust.withColumnRenamed("nk", "nk2"),
        col("nk") === col("nk2") && col("s_acctbal") > col("c_acctbal"))
      .groupBy("nk").agg(count(lit(1)).as("n"))
      .orderBy("nk").as[(Long, Long)].collect().toSeq
    assert(swept == naive)
  }

  test("boundary sweep: no points and null timestamps degenerate cleanly") {
    val iv = Seq((1L, 0L, 10L)).toDF("iv_id", "s_raw", "e_raw")
      .select(col("iv_id"), col("s_raw").cast("timestamp").as("s"),
        col("e_raw").cast("timestamp").as("e"))
    val noPts = Seq.empty[(Long, Long)].toDF("pt_id", "t_raw")
      .select(col("t_raw").cast("timestamp").as("t"))
    assert(RangeJoin.countPerInterval(noPts, "t", iv,
      Seq("iv_id"), "s", "e").count() == 0L)
    // null point timestamps are dropped, not mis-sharded; an interval
    // with a null boundary is dropped like the binned join drops it
    val pts = Seq(Some(5L), None, Some(7L)).toDF("t_raw")
      .select(col("t_raw").cast("timestamp").as("t"))
    val ivNull = Seq((1L, Some(0L), Some(10L)), (2L, Some(0L), None))
      .toDF("iv_id", "s_raw", "e_raw")
      .select(col("iv_id"), col("s_raw").cast("timestamp").as("s"),
        col("e_raw").cast("timestamp").as("e"))
    val out = RangeJoin.countPerInterval(pts, "t", ivNull,
        Seq("iv_id"), "s", "e", countCol = "n")
      .orderBy("iv_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("overlap sweep matches the naive interval join, boundary ties inclusive") {
    import spark.implicits._
    def ivs(rows: Seq[(Long, Long, Long)], s: String, e: String) =
      rows.toDF("id", "s_raw", "e_raw")
        .select(col("id"), col("s_raw").cast("timestamp").as(s),
          col("e_raw").cast("timestamp").as(e))
    // hand-picked boundary cases: b touching a's end exactly (counts —
    // closed), b ending exactly at a's start (counts), b strictly before
    // / after (don't), b containing a, b inside a
    val a = ivs(Seq((1L, 100L, 200L), (2L, 500L, 600L), (3L, 900L, 950L)),
      "as", "ae")
    val b = ivs(Seq(
      (10L, 200L, 300L),  // touches a1.end -> overlap a1
      (11L, 50L, 100L),   // ends exactly at a1.start -> overlap a1
      (12L, 0L, 49L),     // strictly before a1
      (13L, 201L, 499L),  // between a1 and a2
      (14L, 90L, 610L),   // contains a1 AND a2
      (15L, 520L, 530L)), // inside a2
      "bs", "be")
    val sweep = RangeJoin.overlapsPerInterval(a, Seq("id"), "as", "ae",
        b, "bs", "be")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // naive: closed-bounds inequality join
    val naive = a.join(b.withColumnRenamed("id", "bid"),
        col("bs") <= col("ae") && col("be") >= col("as"))
      .groupBy("id").count().orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(sweep == naive, s"sweep $sweep vs naive $naive")
    assert(sweep == Seq((1L, 3L), (2L, 2L)), sweep.toString) // a3 dropped (0)
    // randomized cross-check: 300 random b intervals vs 40 random a's
    val rnd = new scala.util.Random(7)
    val ra = ivs((1L to 40L).map(i =>
      { val s = rnd.nextInt(10000).toLong; (i, s, s + rnd.nextInt(500)) }),
      "as", "ae")
    val rb = ivs((1L to 300L).map(i =>
      { val s = rnd.nextInt(10000).toLong; (i, s, s + rnd.nextInt(300)) }),
      "bs", "be")
    val s2 = RangeJoin.overlapsPerInterval(ra, Seq("id"), "as", "ae",
        rb, "bs", "be", nShards = 7)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val n2 = ra.join(rb.withColumnRenamed("id", "bid"),
        col("bs") <= col("ae") && col("be") >= col("as"))
      .groupBy("id").count().orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(s2 == n2)
  }
}
