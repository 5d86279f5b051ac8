package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector for q_graph_modularity: counts ReusedExchange /
  * scans / join strategies in the executed plan — used to decide whether
  * the three edge-list consumers share the coPairs build via
  * ReuseExchange or re-run it. Usage: `tools/run_main.sh
  * graft.ModularityPlanProbe [sfDir]`. */
object ModularityPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q_graph_modularity")(s, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    def c(pat: String) = pat.r.findAllIn(p).size
    println(s"[modplan] reused=${c("ReusedExchange")} lineitemScans=${c("Scan parquet[^\\n]*lineitem")} " +
      s"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} exch=${c("Exchange (?!Reused)")}")
    s.stop()
  }
}
