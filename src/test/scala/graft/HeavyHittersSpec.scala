package graft

import graft.ops.HeavyHitters
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Misra-Gries candidate/verify heavy hitters: exactness against the
  * brute-force plan on a skewed adversarially-ordered corpus, the bounded
  * per-partition summary contract, the no-false-negative sketch
  * guarantee, and the two-corpus-scan plan shape of the catalog query. */
class HeavyHittersSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // Zipf-ish planted stream: two genuinely heavy items, a tie-straddling
  // mid item, and a long uniform tail — shuffled deterministically so
  // heavy occurrences interleave (the MG decrement path actually fires),
  // then spread over 7 uneven partitions.
  private lazy val planted = {
    val rows = Seq.fill(400)("the") ++ Seq.fill(300)("of") ++
      Seq.fill(90)("mid") ++ (1 to 1200).map(i => s"tail_${i % 600}")
    new scala.util.Random(7).shuffle(rows)
  }

  private def plantedDf = spark.sparkContext
    .parallelize(planted, 7).toDF("item")

  private def bruteForce(k: Int): Map[String, Long] = {
    val n = planted.size.toLong
    planted.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
  }

  test("exact() matches brute force across k, including empty results") {
    for (k <- Seq(2, 8, 48, 256)) {
      val got = HeavyHitters.exact(plantedDf, "item", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == bruteForce(k), s"k=$k")
    }
    // threshold high enough that nothing qualifies -> empty, not error
    assert(HeavyHitters.exact(plantedDf, "item", 1).count() == 0)
  }

  test("summaries are bounded at k item rows + 1 total row per partition") {
    val k = 8
    val perPart = HeavyHitters.summaries(plantedDf, "item", k)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(count(lit(1)).as("rows"),
        sum(when(col("item").isNull, 1).otherwise(0)).as("totals"))
      .collect()
    assert(perPart.nonEmpty)
    perPart.foreach { r =>
      assert(r.getAs[Long]("rows") <= k + 1, s"partition ${r.get(0)} overflow")
      assert(r.getAs[Long]("totals") == 1L)
    }
    // the null-row totals reconstruct N exactly
    val n = HeavyHitters.summaries(plantedDf, "item", k)
      .filter(col("item").isNull).agg(sum("cnt")).head.getLong(0)
    assert(n == planted.size.toLong)
  }

  test("sketch candidates never lose a true heavy hitter (MG guarantee)") {
    for (k <- Seq(2, 4, 8, 16)) {
      val candidates = HeavyHitters.summaries(plantedDf, "item", k)
        .filter(col("item").isNotNull).select("item")
        .distinct().as[String].collect().toSet
      val missed = bruteForce(k).keySet -- candidates
      assert(missed.isEmpty, s"k=$k lost true heavy hitters: $missed")
    }
  }

  test("catalog query scans documents exactly twice (candidate + verify)") {
    val df = SparkEntry.queries("q_text_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
    df.collect() // resolve AQE to the final plan, with stage reuse applied
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 2,
      s"expected 2 documents scans (summary + verify), got ${scans.size}")
  }

  test("catalog query agrees with its oracle shape on sf0.001") {
    val out = SparkEntry.queries("q_text_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty) // 31-word synthetic vocab: heavies exist at k=48
    // exact counts: spot-check against a direct groupBy on the same read
    val direct = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(direct(r.getString(0)) == r.getLong(1)))
  }
}
