package graft

import graft.ops.IntervalExpand
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants of interval expansion (SURVEY §5.3), driven by
  * ScalaCheck generators with fixed seeds (scalatestplus isn't in the
  * offline cache, so sampling is explicit):
  * for samples >= 1,
  *   - output rowcount = Σ samples,
  *   - the first expanded row starts at the input start_time (to the second),
  *   - per-input-row expanded timestamps form a monotone chain whose widths
  *     are the floor-second diffs (faithful-mode drift included),
  *   - strict mode preserves the exact interval end and drops samples<=0.
  */
class IntervalExpandPropSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("start_time", StringType),
    StructField("end_time", StringType),
    StructField("samples", IntegerType)))

  private val intervalGen = for {
    startOff <- Gen.choose(0, 86400)
    durSec <- Gen.choose(1, 3600)
    samples <- Gen.choose(1, 20)
  } yield (startOff, durSec, samples)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def fmt(epoch: Long): String =
    java.time.Instant.ofEpochSecond(epoch)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  private val base = 1688342400L // 2023-07-03 00:00:00 UTC

  test("faithful expansion invariants hold for random valid intervals") {
    (1L to 10L).foreach { seed =>
      val ivs = sample(Gen.listOfN(8, intervalGen), seed)
      val rows = ivs.zipWithIndex.map { case ((off, dur, n), i) =>
        Row(i, fmt(base + off), fmt(base + off + dur), n)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val out = IntervalExpand.faithful(df, sort = false)
        .collect()
        .groupBy(_.getAs[Int]("id"))
      assert(out.values.map(_.length).sum == ivs.map(_._3).sum)
      ivs.zipWithIndex.foreach { case ((off, dur, n), i) =>
        val rs = out(i).map(r =>
          (r.getAs[String]("start_time"), r.getAs[String]("end_time"))).sorted
        assert(rs.length == n)
        assert(rs.head._1 == fmt(base + off))
        val su = (base + off).toDouble
        val delta = dur.toDouble / n
        rs.zipWithIndex.foreach { case ((s, e), k) =>
          assert(s == fmt((su + k * delta).toLong))
          assert(e == fmt((su + (k + 1) * delta).toLong))
          assert(s <= e)
        }
      }
    }
  }

  test("strict mode preserves the exact interval end and emits zero rows for samples<=0") {
    (1L to 10L).foreach { seed =>
      val (off, dur, n) = sample(intervalGen, seed)
      val rows = Seq(
        Row(0, fmt(base + off), fmt(base + off + dur), n),
        Row(1, fmt(base + off), fmt(base + off + dur), 0),
        Row(2, fmt(base + off), fmt(base + off + dur), null))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val out = IntervalExpand.strict(
          df.selectExpr("id", "cast(start_time as timestamp) as start_time",
            "cast(end_time as timestamp) as end_time", "samples"))
        .collect()
      assert(out.forall(_.getAs[Int]("id") == 0) && out.length == n)
      val last = out.maxBy(_.getAs[Int]("sample_idx"))
      assert(last.getAs[java.sql.Timestamp]("end_time").toInstant.getEpochSecond
        == base + off + dur)
    }
  }
}
