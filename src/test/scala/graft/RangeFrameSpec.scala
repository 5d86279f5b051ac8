package graft

import graft.ops.RangeFrame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops.RangeFrame's contract: the chunked (key, time-chunk) evaluation is
  * BIT-IDENTICAL to the plain per-key range-frame window — on the catalog
  * corpus, on a zipf hot-key corpus, and on adversarial boundary fixtures
  * (rows exactly on chunk edges, duplicate timestamps straddling them).
  */
class RangeFrameSpec extends SparkSpec {

  private val H = 3600L * 1000000L

  private def plain(df: DataFrame, lookback: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t_us"))
      .rangeBetween(-lookback, Window.currentRow)
    df.select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n"), sum(col("v")).over(w).as("s"))
  }

  private def chunked(df: DataFrame, lookback: Long): DataFrame =
    RangeFrame.trailing(df, "user_id", "t_us", lookback,
        Seq("n" -> count(lit(1)), "s" -> sum(col("v"))))
      .select(col("event_id"), col("user_id"), col("n"), col("s"))

  private def asMap(df: DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

  test("chunked == plain on the catalog events table (1h and 7d lookbacks)") {
    val ev = graft.queries.tbl(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("v"))
    for (lb <- Seq(H, 7L * 24L * H)) {
      val p = asMap(plain(ev, lb))
      val c = asMap(chunked(ev, lb))
      assert(p.nonEmpty && p == c, s"lookback $lb: chunked diverges")
    }
  }

  test("boundary fixtures: chunk-edge rows, duplicate timestamps, exact-lookback gaps") {
    import spark.implicits._
    // Chunk width = H. Rows sit exactly ON chunk boundaries (t = 0, H,
    // 2H), exactly lookback apart (both endpoints inclusive on both
    // formulations), one micro inside/outside, plus duplicate timestamps
    // straddling a boundary (range frames include ALL peers of the
    // current timestamp).
    val rows = Seq(
      (1L, 7L, 0L, 1L),
      (2L, 7L, H - 1L, 2L),          // last micro of chunk 0
      (3L, 7L, H, 4L),               // first micro of chunk 1; frame reaches t=0
      (4L, 7L, H, 8L),               // duplicate timestamp peer
      (5L, 7L, 2L * H, 16L),         // frame [H, 2H]: includes 3,4, not 1,2
      (6L, 7L, 2L * H + 1L, 32L),    // frame [H+1, 2H+1]: EXCLUDES the t=H peers
      (7L, 9L, 5L, 64L),             // second key, isolated
      (8L, 9L, H + 5L, 128L))        // exactly lookback after -> inclusive
      .toDF("event_id", "user_id", "t_us", "v")
    val p = asMap(plain(rows, H))
    val c = asMap(chunked(rows, H))
    assert(p == c, s"plain $p vs chunked $c")
    // spot-check the hand-traced values so the fixture itself is honest
    assert(p(3L) == ((4L, 15L)), p(3L).toString) // t=H sees 0, H-1, H, H (peers)
    assert(p(6L) == ((2L, 48L)), p(6L).toString) // [H+1, 2H+1]: only 5,6
    assert(p(8L) == ((2L, 192L)), p(8L).toString) // exactly-lookback inclusive
  }

  test("negative (pre-epoch) timestamps: floor-div chunking keeps chunked == plain") {
    import spark.implicits._
    // Rows straddle t=0. Truncate-toward-zero chunking would put
    // (-H, 0) and [0, H) both in chunk 0, so the t=-1 row would
    // wrongly be a same-chunk peer (not a context row) of t in [0, H)
    // and the t = -H - 1 row would lose its context propagation into
    // the chunk holding t = -5. Floor division keeps the invariant.
    val rows = Seq(
      (1L, 7L, -2L * H + 3L, 1L),
      (2L, 7L, -H - 1L, 2L),       // last micro of chunk -2
      (3L, 7L, -H, 4L),            // first micro of chunk -1; frame reaches -2H
      (4L, 7L, -5L, 8L),           // chunk -1; frame [-H-5, -5] includes 2,3
      (5L, 7L, -1L, 16L),          // last pre-epoch micro
      (6L, 7L, 0L, 32L),           // epoch: frame [-H, 0] includes 3,4,5
      (7L, 7L, H - 2L, 64L),       // frame [-2, H-2] includes 5,6
      (8L, 9L, -H, 128L))          // second key, isolated
      .toDF("event_id", "user_id", "t_us", "v")
    val p = asMap(plain(rows, H))
    val c = asMap(chunked(rows, H))
    assert(p == c, s"plain $p vs chunked $c")
    // hand-traced: the epoch row's trailing hour spans three chunks' rows
    assert(p(6L) == ((4L, 60L)), p(6L).toString) // t=0 sees -H, -5, -1, 0
    assert(p(4L) == ((3L, 14L)), p(4L).toString) // t=-5 sees -H-1, -H, -5
  }

  test("zipf hot key: chunked == plain, and the hot key spans many chunks") {
    import spark.implicits._
    // hot user: 20k events over ~55 hours (one per 10 s); 200 cold users
    // with 20 events each — the shape where partition-by-key serializes
    // the hot user into one task but chunking splits it ~55 ways.
    val hot = (0 until 20000).map(i =>
      (i.toLong, 1L, i.toLong * 10L * 1000000L, (i % 97).toLong))
    val cold = for (u <- 2 to 201; i <- 0 until 20) yield
      ((u * 100000 + i).toLong, u.toLong,
        (i.toLong * 3600L + u) * 1000000L, (i % 13).toLong)
    val ev = (hot ++ cold).toDF("event_id", "user_id", "t_us", "v")
      .repartition(32)
    val p = asMap(plain(ev, H))
    val c = asMap(chunked(ev, H))
    assert(p == c)
    // the hot key's rows really do land in many distinct chunks
    val nChunks = ev.filter(col("user_id") === 1L)
      .select((col("t_us") / H).cast("long")).distinct().count()
    assert(nChunks > 50, s"fixture degenerate: hot key spans $nChunks chunks")
  }
}
