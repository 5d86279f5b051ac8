package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the graph queries' zipf-skew behavior: stage-level
  * timings (pair derivation, backbone, per-node triangle close / linkpred
  * wedge explode) + the backbone degree distribution, on any corpus dir.
  * Usage: `Test/runMain graft.GraphSkewProbe <sfDir>`
  */
object GraphSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_zipf")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graph-skew-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = graft.queries.tbl(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_suppkey"))).as("supps"))
      .select(explode(flatten(transform(col("supps"), (x, i) =>
        transform(slice(col("supps"), i + 2, size(col("supps"))),
          y => struct(x.as("src"), y.as("dst")))))).as("p"))
      .groupBy(col("p.src").as("src"), col("p.dst").as("dst"))
      .agg(count(lit(1)).as("w"))
      .persist()
    time("pairs materialize")(pairs.count())
    val bb = graft.ops.Triangles.backbone(pairs, 5).persist()
    time("backbone materialize")(bb.count())
    val deg = bb.select(col("src").as("v")).union(bb.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    println("[probe] backbone degree distribution (top 8):")
    deg.orderBy(desc("d")).limit(8).collect()
      .foreach(r => println(s"[probe]   node ${r.get(0)} deg ${r.getLong(1)}"))
    println("[probe] nodes with deg > 256: " +
      deg.filter(col("d") > 256).count())
    time("triangles perNode")(graft.ops.Triangles.perNode(bb).count())
    time("linkpred (uncapped)")(graft.ops.Triangles.linkPredict(bb).count())
    pairs.unpersist(); bb.unpersist()
    spark.stop()
  }
}
