package graft

import graft.ops.BloomDedup
import graft.queries.{tbl, TextQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for SCALE.md: the long-horizon stress shape of the
  * two fit-once streaming GATES (`q_stream_bloom_gate` /
  * `q_stream_drift_gate` are the 4-batch catalog versions) — what
  * happens to per-batch wall when the loop runs for ~20 staged batches
  * and the seen-state actually GROWS, the way production runs it daily.
  * Usage: `Test/runMain graft.StreamGateGrowthProbe [sfDir] [nBatches]`
  *
  * Bloom-gate loop, per batch: (1) probe the batch against the CURRENT
  * sketch + corpus (the gate), (2) ADMIT the batch — OR-merge its
  * fitted sub-sketch into the corpus sketch (Bloom filters of equal
  * geometry merge exactly; the re-broadcast replaces the old handle,
  * which is unpersisted) and append the batch to the verify corpus.
  * This is the axis the catalog query holds fixed: state grows batch
  * over batch, and the question is whether probe wall stays flat (the
  * sketch is fixed-size by construction; the verify corpus pass grows
  * linearly with ADMITTED volume — the documented per-probe corpus
  * scan).
  *
  * Drift-gate loop, per batch: the KL(batch ‖ reference) computation
  * against the fit-once reference. The gate is stateless by design —
  * the probe demonstrates exactly that: no hidden accumulation (caches,
  * broadcasts, sink partitions) bends the per-batch wall as batches
  * accumulate.
  */
object StreamGateGrowthProbe {

  private def mergeSketches(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("stream-gate-growth-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = tbl(spark, sfDir, "documents").persist()
    val isNew = col("doc_id") % 5 === 0
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- bloom gate: state grows by admission -------------------------
    val est = 1L << 22; val bits = 1L << 25
    var corpus = d.where(!isNew).select("doc_id", "text").persist()
    var sketchBytes = BloomDedup.fitSketch(corpus, "doc_id", "text",
      estItems = est, numBits = bits)
    var handle = spark.sparkContext.broadcast(sketchBytes)
    println(s"[gate-probe] bloom: base corpus=${corpus.count()} docs, " +
      s"sketch=${sketchBytes.length / 1024 / 1024} MiB, $nBatches batches")
    println("[gate-probe] bloom: batch | docs | probe_s | hits | " +
      "admit_s | corpus_docs")
    for (i <- 0 until nBatches) {
      val batch = d.where(isNew && (col("doc_id") / 5) % nBatches === i)
        .select("doc_id", "text").persist()
      val nDocs = batch.count()
      val (hits, probeS) = timed(
        BloomDedup.seenBlocks(corpus, batch, "doc_id", "text", handle)
          .count())
      val (_, admitS) = timed {
        val batchSketch = BloomDedup.fitSketch(batch, "doc_id", "text",
          estItems = est, numBits = bits)
        sketchBytes = mergeSketches(sketchBytes, batchSketch)
        handle.unpersist()
        handle = spark.sparkContext.broadcast(sketchBytes)
        val grown = corpus.unionByName(batch).persist()
        grown.count()
        corpus.unpersist()
        corpus = grown
      }
      println(f"[gate-probe] bloom: $i%5d | $nDocs%4d | $probeS%7.2f | " +
        f"$hits%4d | $admitS%7.2f | ${corpus.count()}%11d")
      batch.unpersist()
    }
    handle.unpersist()
    corpus.unpersist()

    // ---- drift gate: stateless per batch, flat by design ---------------
    val ref = TextQueries.klRefFor(spark, sfDir)
    println(s"[gate-probe] drift: reference buckets=${ref.buckets.size}, " +
      s"totC=${ref.totC}, $nBatches batches")
    println("[gate-probe] drift: batch | docs | kl_s | kl_micro")
    for (i <- 0 until nBatches) {
      val batch = d.where(isNew && (col("doc_id") / 5) % nBatches === i)
        .persist()
      val nDocs = batch.count()
      val (kl, klS) = timed {
        val cs = batch
          .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
          .filter(col("term") =!= "")
          .withColumn("bucket",
            when(col("term").isin(ref.kept: _*), col("term"))
              .otherwise(lit("<oov>")))
          .groupBy("bucket").agg(count(lit(1)).as("cs"))
          .persist()
        val refDf = spark.createDataFrame(ref.buckets).toDF("bucket", "cc")
        val row = cs.join(refDf, "bucket")
          .crossJoin(cs.agg(sum("cs").as("tot_b")))
          .withColumn("contrib", floor(
            (col("cs").cast("double") / col("tot_b")) *
              log((col("cs").cast("double") * ref.totC) /
                (col("tot_b").cast("double") * col("cc"))) *
              1000000d + 0.5d).cast("long"))
          .agg(sum("contrib").as("kl_micro"))
          .head().getLong(0)
        cs.unpersist()
        row
      }
      println(f"[gate-probe] drift: $i%5d | $nDocs%4d | $klS%6.2f | $kl%8d")
      batch.unpersist()
    }
    spark.stop()
  }
}
