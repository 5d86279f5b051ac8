package graft

import graft.io.GraphBackbone
import graft.ops.Triangles
import org.apache.spark.sql.functions._

/** The corpus-artifact contract for the persisted co-occurrence edge
  * builds: the artifact scan is row-identical to the fresh coPairs
  * build, consumers are memoized to ONE build per (corpus, name) per
  * JVM, and the cross-session load path refuses a params mismatch
  * loudly instead of probing a differently-built graph. */
class GraphBackboneSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("artifact scan is row-identical to the fresh coPairs build") {
    val fresh = Triangles.coPairs(
      spark.read.parquet(s"$sf001/lineitem.parquet")
        .select("l_orderkey", "l_suppkey"),
      "l_orderkey", "l_suppkey", maxBasket = 64)
    val art = GraphBackbone.pairsFor(spark, sf001, "spec_co_supplier",
      Map("fact" -> "lineitem", "maxBasket" -> "64")) { fresh }
    val a = fresh.orderBy("src", "dst").collect().toSeq
    val b = art.orderBy("src", "dst").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("pairsFor builds once per (corpus, name) per JVM") {
    var builds = 0
    def build = {
      builds += 1
      Triangles.coPairs(
        spark.read.parquet(s"$sf001/lineitem.parquet")
          .select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", maxBasket = 64)
    }
    val n1 = GraphBackbone.pairsFor(spark, sf001, "spec_once",
      Map("maxBasket" -> "64"))(build).count()
    val n2 = GraphBackbone.pairsFor(spark, sf001, "spec_once",
      Map("maxBasket" -> "64"))(build).count()
    assert(builds == 1 && n1 == n2 && n1 > 0)
  }

  test("loadFrom validates the params sidecar and refuses mismatches") {
    GraphBackbone.pairsFor(spark, sf001, "spec_load",
      Map("item" -> "l_suppkey", "maxBasket" -> "64")) {
      Triangles.coPairs(
        spark.read.parquet(s"$sf001/lineitem.parquet")
          .select("l_orderkey", "l_suppkey"),
        "l_orderkey", "l_suppkey", maxBasket = 64)
    }
    val path = GraphBackbone.artifactPath(sf001, "spec_load")
    val ok = GraphBackbone.loadFrom(spark, path,
      Map("item" -> "l_suppkey", "maxBasket" -> "64"))
    assert(ok.count() > 0)
    val ex = intercept[IllegalArgumentException] {
      GraphBackbone.loadFrom(spark, path,
        Map("item" -> "l_partkey", "maxBasket" -> "64"))
    }
    assert(ex.getMessage.contains("different params"))
  }

  test("graph consumers agree with a from-scratch derivation via the artifact") {
    // q_graph_components over the artifact vs the same op over a fresh
    // edge build — the consumer-level equality the lifecycle must keep
    val fresh = Triangles.coPairs(
        spark.read.parquet(s"$sf001/lineitem.parquet")
          .select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", maxBasket = 64)
      .filter(col("w") >= 2)
    val fromScratch = graft.ops.Components
      .connectedComponents(fresh, "src", "dst")
      .orderBy("id").collect().toSeq
    val viaArtifact = SparkEntry.queries("q_graph_components")(spark, sf001)
      .collect().toSeq
    assert(fromScratch.nonEmpty && fromScratch == viaArtifact)
  }
}
