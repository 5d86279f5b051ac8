package graft

import org.apache.spark.sql.functions._
import graft.ops.Hilbert

/** Contract tests for the Hilbert curve: bijectivity, continuity (the
  * property Z-order lacks), Column-fold == scalar reference, and the
  * clustered-write round trip. */
class HilbertSpec extends SparkSpec {

  test("bits=4: bijection onto [0, 256) and one-grid-step continuity") {
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong, Hilbert.dValueScalar(x, y, bits = 4))
    val ds = cells.map(_._3).sorted
    assert(ds == (0L until 256L).toList, "keys must cover 0..255 exactly")
    // continuity: consecutive keys are ADJACENT grid cells — the Hilbert
    // guarantee (the Z-curve violates this at every power-of-two seam)
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("Column fold equals the scalar reference at bits=12") {
    import spark.implicits._
    // corners, the quadrant seams where rotation bugs live, and a spread
    val pts = Seq((0L, 0L), (4095L, 0L), (0L, 4095L), (4095L, 4095L),
      (2047L, 2048L), (2048L, 2047L), (1L, 4094L), (1234L, 987L),
      (3000L, 17L), (2048L, 2048L))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Hilbert.dValue(col("x"), col("y"), bits = 12).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(out((x, y)) == Hilbert.dValueScalar(x, y, bits = 12),
        s"mismatch at ($x, $y)")
    }
  }

  test("clustered write: range-partitioned files, contents preserved") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hil").toString + "/t"
    val df = (0 until 4096).map(i => (i.toLong, (i * 2654435761L) % 4096L))
      .toDF("a", "b")
    Hilbert.writeClustered(df, dir,
      col("a") % 4096, col("b"), bits = 12, nFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4096)
    assert(back.agg(sum("a"), sum("b")).head() ==
      df.agg(sum("a"), sum("b")).head())
  }
}
