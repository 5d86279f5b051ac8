package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Dedup

/** Scratch stage-bisection for the round-16 optimization targets
  * (q_text_textrank's PageRank rounds, q_curate_pipeline_v3's chain):
  * times each sub-plan so the dominant stage is measured, not guessed
  * (guide §1). `Test/runMain graft.R16Probe`. */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("r16-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r16probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    graft.queries.registerAll(spark, sfDir)
    graft.queries.tableNames.foreach(t => spark.table(t).limit(1).count())

    // ---- textrank: how does fixedPoint cost scale with iters? ----
    val toks = graft.queries.tbl(spark, sfDir, "documents")
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z0-9]+")))
      .toDF("doc_id", "pos", "w")
    val ids = graft.ops.TopK.perGroup(
        toks.filter(col("w") =!= "").groupBy("w")
          .agg(count(lit(1)).as("cnt")).withColumn("g", lit(1)),
        Seq("g"), Seq(("cnt", false), ("w", true)),
        k = 64, rankCol = "node")
      .select(col("w"), col("node").cast("long").as("node"))
    val seqw = Window.partitionBy("doc_id").orderBy("pos")
    val pairsWin = toks.withColumn("w2", lead("w", 1).over(seqw))
      .filter(col("w") =!= "" && col("w2").isNotNull &&
        col("w2") =!= "" && col("w") =!= col("w2"))
      .join(broadcast(ids.select(col("w"), col("node").as("id1"))), "w")
      .join(broadcast(ids.select(col("w").as("w2"),
        col("node").as("id2"))), "w2")
      .select("id1", "id2")
    val edges = pairsWin.select(col("id1").as("src"), col("id2").as("dst"))
      .unionAll(pairsWin.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
    for (it <- Seq(1, 2, 5, 10)) {
      spark.catalog.clearCache()
      time(s"tr: pagerank iters=$it")(
        noop(graft.ops.PageRank.fixedPoint(edges, it)))
    }
    // driver fixed-point over the collected K-bounded edge list
    spark.catalog.clearCache()
    time("tr: edges collect + driver pr") {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val R = 1000000000L; val damp = 850000000L
      val nodesArr = es.map(_._1).distinct.sorted
      val idx = nodesArr.zipWithIndex.toMap
      val outdeg = new Array[Long](nodesArr.length)
      es.foreach { case (s0, _) => outdeg(idx(s0)) += 1 }
      val nn = nodesArr.length.toLong
      var r = Array.fill(nodesArr.length)(R / nn)
      for (_ <- 1 to 10) {
        val s = new Array[Long](nodesArr.length)
        es.foreach { case (s0, d0) =>
          val i = idx(s0); s(idx(d0)) += r(i) / outdeg(i) }
        r = Array.tabulate(nodesArr.length)(i =>
          (R - damp) / nn + (damp * s(i)) / R)
      }
      r.sum
    }

    // ---- v3 internals bisection: inline curateChain on both day inputs --
    val d = graft.queries.tbl(spark, sfDir, "documents")
    val dayV2 = d.filter(col("doc_id") % 5 === 0)
    // v3 admitted frame (stage 0 output)
    val ref = graft.queries.TextQueries.klRefFor(spark, sfDir)
    val n = graft.streaming.StreamOps.DefaultChunks
    val bounds = dayV2.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .select(col("lo"), expr(s"(hi - lo) div $n").as("step"))
    val batched = dayV2.crossJoin(broadcast(bounds))
      .withColumn("batch_id",
        when(col("step") <= 0, lit((n - 1).toLong))
          .otherwise(least(lit((n - 1).toLong),
            expr("(doc_id - lo) div step"))))
      .drop("lo", "step")
    val refDf = spark.createDataFrame(ref.buckets).toDF("bucket", "cc")
    val bcA = batched
      .select(col("batch_id"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
      .withColumn("bucket",
        when(col("term").isin(ref.kept: _*), col("term"))
          .otherwise(lit("<oov>")))
      .groupBy("batch_id", "bucket").agg(count(lit(1)).as("cs"))
    val tot = bcA.groupBy("batch_id").agg(sum("cs").as("tot_b"))
    val kl = bcA.join(broadcast(refDf), "bucket")
      .join(broadcast(tot), "batch_id")
      .withColumn("contrib", floor(
        (col("cs").cast("double") / col("tot_b")) *
          log((col("cs").cast("double") * ref.totC) /
            (col("tot_b").cast("double") * col("cc"))) *
          1000000d + 0.5d).cast("long"))
      .groupBy("batch_id").agg(sum("contrib").as("kl_micro"))
    val quarantined = kl.orderBy(desc("kl_micro"), asc("batch_id")).limit(1)
      .select("batch_id")
    val dayV3 = batched
      .join(broadcast(quarantined), Seq("batch_id"), "left_anti")
      .drop("batch_id")

    for ((tag, day) <- Seq(("v2", dayV2), ("v3", dayV3))) {
      spark.catalog.clearCache()
      val sub = when(col("doc_id") % 7 === 0, lit("cdn."))
        .when(col("doc_id") % 7 === 1, lit("www.")).otherwise(lit(""))
      val hosted = day.withColumn("registered_domain",
        array_join(slice(split(
          concat(sub, col("source"), lit(".example.com")), "\\."), -3, 3), "."))
      val bl = spark.createDataFrame(Seq(Tuple1("src15.example.com"),
        Tuple1("phish.example.net"))).toDF("blocked_domain")
      val unblocked = hosted.join(broadcast(bl),
        hosted("registered_domain") === bl("blocked_domain"), "left_anti")
      val byUrl = Window.partitionBy(xxhash64(col("canonical_url")))
      // inline copy of LlmOps.withCanonicalUrl (private there)
      def withCanon(df: org.apache.spark.sql.DataFrame) = {
        val raw = concat(
          when(col("doc_id") % 2 === 0, lit("HTTP://")).otherwise(lit("http://")),
          when(col("doc_id") % 3 === 0, upper(col("source"))).otherwise(col("source")),
          lit(".example.com"),
          when(col("doc_id") % 5 === 0, lit(":80")).otherwise(lit("")),
          lit("/p/"), expr("doc_id div 40").cast("string"),
          when(col("doc_id") % 13 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&utm_sid="), (col("doc_id") % 4).cast("string"),
          when(col("doc_id") % 2 === 0, lit("&a=1&b=2")).otherwise(lit("&b=2&a=1")),
          when(col("doc_id") % 11 === 0, lit("&utm_campaign=x")).otherwise(lit("")))
        df.withColumn("raw", raw)
          .withColumn("scheme", lower(element_at(split(col("raw"), "://"), 1)))
          .withColumn("rest", element_at(split(col("raw"), "://"), 2))
          .withColumn("hostport", element_at(split(col("rest"), "/"), 1))
          .withColumn("host", lower(
            when(col("scheme") === "http",
              regexp_replace(col("hostport"), ":80$", ""))
            .when(col("scheme") === "https",
              regexp_replace(col("hostport"), ":443$", ""))
            .otherwise(col("hostport"))))
          .withColumn("pathq", expr("substring(rest, length(hostport) + 1)"))
          .withColumn("path0", element_at(split(col("pathq"), "\\?"), 1))
          .withColumn("query",
            when(size(split(col("pathq"), "\\?")) >= 2,
              element_at(split(col("pathq"), "\\?"), 2)).otherwise(lit("")))
          .withColumn("path",
            when(regexp_replace(col("path0"), "/+$", "") === "", lit("/"))
              .otherwise(regexp_replace(col("path0"), "/+$", "")))
          .withColumn("params", filter(split(col("query"), "&"),
            p => !p.startsWith("utm_") && p =!= ""))
          .withColumn("canonical_url",
            concat(col("scheme"), lit("://"), col("host"), col("path"),
              when(size(col("params")) > 0,
                concat(lit("?"), array_join(array_sort(col("params")), "&")))
                .otherwise(lit(""))))
          .drop("raw", "scheme", "rest", "hostport", "pathq", "path0", "query",
            "path", "params")
      }
      val urlKept = withCanon(unblocked)
        .withColumn("_uk", min("doc_id").over(byUrl))
        .filter(col("doc_id") === col("_uk"))
        .drop("_uk", "canonical_url", "registered_domain")
        .persist()
      time(s"$tag: urlKept materialize")(urlKept.count())
      val corpus = d.filter(col("doc_id") % 5 =!= 0)
      val sketch = time(s"$tag: bloom fitSketch")(
        spark.sparkContext.broadcast(
          graft.ops.BloomDedup.fitSketch(corpus, "doc_id", "text")))
      val seenHigh = graft.ops.BloomDedup
        .seenBlocks(corpus, urlKept, "doc_id", "text", sketch)
        .filter(col("seen_ppm") >= 500000L)
        .select("doc_id")
      val fresh = urlKept.join(broadcast(seenHigh), Seq("doc_id"), "left_anti")
        .persist()
      time(s"$tag: fresh materialize")(fresh.count())
      val sigs = Dedup.minHashSignatures(fresh, "doc_id", "text")
      val cands = Dedup.lshCandidatePairs(sigs).persist()
      time(s"$tag: cands materialize")(cands.count())
      val dupDrop = Dedup
        .verifyCandidates(fresh, "doc_id", "text", cands, "id_a", "id_b")
        .select(col("id_b").as("doc_id")).distinct()
      time(s"$tag: verify + dupDrop")(dupDrop.count())
    }
    spark.stop()
  }
}
