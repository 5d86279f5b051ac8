package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-lifecycle persistence for the co-occurrence EDGE BUILD — the
  * `Triangles.coPairs` kernel output that every graph-tier query starts
  * from.
  *
  * Why this exists (the `fitIvf` / [[SketchStore]] argument applied to
  * graphs): the eight co-occurrence consumers — triangles, link
  * prediction, components, LPA, k-core, modularity, BFS, source-overlap
  * — each previously re-ran the basket collapse + map-side pair explode
  * from the fact table. At 100 TB the edge build IS each query's
  * dominant cost: one corpus-scale shuffle per query for an artifact
  * that is identical across all of them and changes only when the
  * corpus does. Production graph stacks persist the edge list once per
  * corpus ingest and point every downstream analytic at it; this helper
  * gives the catalog that lifecycle.
  *
  * Mechanics: `pairsFor` builds the pair list ONCE per (corpus, name)
  * per JVM, writes it as a parquet artifact with a `_params.txt`
  * sidecar (the SketchStore refusal contract: probing an artifact built
  * with a different basket column / item column / cap would silently
  * compute a different graph, so params are validated at load), and
  * every call — first included — returns the READ-BACK frame, so
  * consumers always execute against the artifact scan, never the build
  * lineage. The artifact is edge-sized (≤ cap²/2 pairs per basket,
  * ~|item-pairs| rows total — orders of magnitude smaller than the fact
  * table), so the read is a narrow columnar scan that AQE/broadcast
  * planning sees EXACT statistics for (a fringe benefit over the build
  * lineage, whose size Catalyst can only guess).
  *
  * Freshness: the build is keyed per JVM and written with overwrite, so
  * a session never trusts another session's artifact by accident
  * (scaled test corpora are rebuilt between sessions). Cross-session
  * reuse — the nightly-ingest production shape — goes through
  * [[loadFrom]], which validates the params sidecar and refuses
  * mismatches loudly.
  *
  * Determinism: `coPairs` is deterministic at any partitioning (sorted
  * distinct arrays, deterministic cap slice), so consumers are
  * bit-identical against the artifact vs the fresh build —
  * GraphBackboneSpec pins that equality, and the catalog's DuckDB
  * oracles keep recomputing the edge derivation from the raw fact
  * table, which verifies the artifact CONTENT on every gate run. */
object GraphBackbone {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Artifact location for (corpus dir, artifact name) — beside the
    * replay sidecars, same key scheme. */
  def artifactPath(dir: String, name: String): String =
    ReplaySidecar.sidecarPath(dir, s"backbone_$name")

  /** Build-once-per-corpus-per-JVM: persist `build`'s result under
    * (dir, name) with `params` stamped in the sidecar, and return the
    * read-back artifact frame. Later calls (any consumer, same JVM)
    * skip straight to the scan. */
  def pairsFor(spark: SparkSession, dir: String, name: String,
               params: Map[String, String])(build: => DataFrame): DataFrame = {
    val path = built.computeIfAbsent(s"$dir#$name", _ => {
      val p = artifactPath(dir, name)
      build.write.mode("overwrite").parquet(p)
      writeParams(spark, p, params)
      p
    })
    spark.read.parquet(path)
  }

  /** Load a persisted backbone from an explicit path (the cross-session
    * production lifecycle), refusing loudly if the stamped params do not
    * match the caller's expectation. */
  def loadFrom(spark: SparkSession, path: String,
               expect: Map[String, String]): DataFrame = {
    val have = readParams(spark, path)
    val mismatched = expect.keys.filter(k => have.get(k) != expect.get(k))
    require(mismatched.isEmpty,
      s"backbone artifact at $path was built with different params: " +
        mismatched.map(k => s"$k=${have.getOrElse(k, "<absent>")} " +
          s"(want ${expect(k)})").mkString(", "))
    spark.read.parquet(path)
  }

  private def writeParams(spark: SparkSession, dataPath: String,
                          params: Map[String, String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dataPath, "_params.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(params.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readParams(spark: SparkSession,
                         dataPath: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(dataPath, "_params.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"backbone artifact at $dataPath has no params " +
      "sidecar — refusing to probe an unvalidated edge list")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim }.toMap
  }
}
