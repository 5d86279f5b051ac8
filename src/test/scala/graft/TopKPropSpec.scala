package graft

import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: the heap-pruned top-k equals the single-phase window
  * it replaces, on random skewed data with heavy value ties (the sort key
  * stays a total order via the unique id tiebreaker — the operator's
  * documented requirement). Fixed seeds, explicit sampling, matching the
  * repo's other property specs. */
class TopKPropSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    group <- Gen.oneOf("a", "b", "c", "d")
    value <- Gen.choose(0, 20) // narrow domain => many ties on value
  } yield (group, value)

  test("heap-pruned rank trio matches the single-phase window (100 random tables)") {
    for (i <- 0 until 100) {
      val rows = Gen.listOfN(200, rowGen)
        .apply(Gen.Parameters.default, Seed(i.toLong)).get
        .zipWithIndex.map { case ((g, v), id) => (g, v.toDouble, id.toLong) }
      val df = rows.toDF("g", "v", "id").repartition(7) // multiple partitions
      val k = 1 + i % 7
      val keys = Seq("v" -> false, "id" -> true)
      val got = TopK.rankTrio(df, Seq("g"), keys, k)
        .select("g", "v", "id", "rn", "rnk", "drnk")
        .orderBy("g", "rn")
        .collect().map(_.toSeq).toSeq
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
      val want = df
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= k)
        .select("g", "v", "id", "rn", "rnk", "drnk")
        .orderBy("g", "rn")
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"mismatch at seed=$i k=$k")
    }
  }
}
