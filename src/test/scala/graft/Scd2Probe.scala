package graft

import graft.ops.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway scaling probe (SCALING.md): shows scd2Apply's join exchanges
  * ONLY the dimension's current slice — shuffle volume is independent of
  * history depth, while a naive whole-dimension join shuffles everything.
  * Usage: `Test/runMain graft.Scd2Probe [sfDir]`. Broadcast is disabled so
  * both shapes shuffle and the exchanged bytes are comparable.
  */
object Scd2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eot = 253402300799L
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))

    // dimension with h closed versions per entity plus one open (current)
    def dimWithHistory(h: Int): DataFrame = {
      val current = c.withColumn("valid_from", lit(h.toLong))
        .withColumn("valid_to", lit(eot))
      if (h == 0) current
      else (0 until h).map(i =>
          c.withColumn("c_acctbal", round(col("c_acctbal") + i, 2))
            .withColumn("valid_from", lit(i.toLong))
            .withColumn("valid_to", lit(i + 1L)))
        .reduce(_ unionByName _).unionByName(current)
    }
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 999, 2))

    def report(name: String, df: DataFrame): Unit = {
      val (n, bytes) = PlanMetrics.shuffled(df)
      println(f"[scd2] $name%-36s exchanges=$n%2d shuffledMB=${bytes / 1e6}%8.2f")
    }
    for (h <- Seq(0, 10)) {
      val dim = dimWithHistory(h)
      report(s"scd2Apply history=$h (dim=${dim.count()} rows)",
        Merge.scd2Apply(dim, updates, "c_custkey",
          Seq("c_mktsegment", "c_acctbal"), "valid_from", "valid_to",
          batchTs = 1000L))
    }
    // the shape scd2Apply avoids: whole-dimension (history included) join
    val naive = dimWithHistory(10)
      .join(updates.select(col("c_custkey"),
          col("c_mktsegment").as("u_seg"), col("c_acctbal").as("u_bal")),
        Seq("c_custkey"), "full_outer")
    report("naive whole-dim join history=10", naive)
    spark.stop()
  }
}
