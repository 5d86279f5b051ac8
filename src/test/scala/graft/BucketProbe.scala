package graft

import graft.ops.Bucketing
import graft.queries.tbl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for SCALING.md §3: shuffle volume of the same
  * join + same-key aggregation over raw parquet vs a bucketed layout.
  * Usage: `Test/runMain graft.BucketProbe [sfDir]`
  * Prints per-plan shuffle exchange count and total exchanged bytes
  * (ShuffleExchangeExec "dataSize" metric, summed after execution).
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("bucket-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the probe measures the catalog query's OWN inputs and join/agg body
    // (shared builders in Relational), so the SCALING.md numbers cannot
    // silently drift from the q_join_bucketed plan
    import graft.queries.Relational.{bucketedJoinAgg, customerProjection, ordersProjection}
    val ordersRaw = ordersProjection(spark, sfDir)
    val custRaw = customerProjection(spark, sfDir)

    val (nRaw, bytesRaw) = PlanMetrics.shuffled(bucketedJoinAgg(ordersRaw, custRaw))

    val sfx = Bucketing.tableSuffix(sfDir)
    val ob = Bucketing.ensureBucketed(spark, s"probe_orders_bkt_$sfx", ordersRaw, 8, "o_custkey")
    val cb = Bucketing.ensureBucketed(spark, s"probe_customer_bkt_$sfx", custRaw, 8, "c_custkey")
    val (nBkt, bytesBkt) = PlanMetrics.shuffled(bucketedJoinAgg(spark.table(ob), spark.table(cb)))

    println(f"[bucket-probe] raw parquet: $nRaw exchanges, ${bytesRaw / 1024.0 / 1024.0}%.1f MiB exchanged")
    println(f"[bucket-probe] bucketed:    $nBkt exchanges, ${bytesBkt / 1024.0 / 1024.0}%.1f MiB exchanged")
    spark.stop()
  }
}
