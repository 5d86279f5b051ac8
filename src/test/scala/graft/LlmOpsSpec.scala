package graft

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.graft.CosineSimilarity.cosine_sim
import org.apache.spark.sql.functions._

/** Unit tests for dedup / similarity / text-analysis kernels. */
class LlmOpsSpec extends SparkSpec {

  import spark.implicits._

  test("exactKeep collapses identical texts to min id") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactKeep(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(kept.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSeq
      == Seq((1L, 2L), (3L, 1L)))
  }

  test("shingles: distinct char n-grams; short strings degrade gracefully") {
    val df = Seq(("abcd", 1)).toDF("text", "id")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    assert(df.head().getSeq[String](0) == Seq("abc", "bcd"))
    val short = Seq(("ab", 1)).toDF("text", "id")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    assert(short.head().getSeq[String](0) == Seq("ab"))
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq(("abcabc", "abcabc", "xyzwxy")).toDF("a", "b", "c")
    val r = df.select(
      Dedup.jaccard(Dedup.shingles(col("a"), 3), Dedup.shingles(col("b"), 3)).as("same"),
      Dedup.jaccard(Dedup.shingles(col("a"), 3), Dedup.shingles(col("c"), 3)).as("diff"))
      .head()
    assert(r.getAs[Double]("same") == 1.0)
    assert(r.getAs[Double]("diff") == 0.0)
  }

  test("minhash LSH surfaces a planted near-duplicate") {
    val base = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 6).trim
    val docs = (Seq((0L, base), (1L, base + " tail")) ++
      (2L to 20L).map(i => (i, s"completely different content number $i with its own words")))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(Dedup.minHashSignatures(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("verifyCandidatesScoped matches verifyCandidates and frees its cache") {
    val base = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 6).trim
    val docs = (Seq((0L, base), (1L, base + " tail")) ++
      (2L to 20L).map(i => (i, s"completely different content number $i with its own words")))
      .toDF("doc_id", "text")
    val cands = Seq((0L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    val sessionCached =
      Dedup.verifyCandidates(docs, "doc_id", "text", cands, "id_a", "id_b").collect()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val scoped =
      Dedup.verifyCandidatesScoped(docs, "doc_id", "text", cands, "id_a", "id_b")
    // the scoped variant's shingle cache is gone the moment it returns; only
    // the eager localCheckpoint RDD backing the RESULT may remain
    assert(spark.sparkContext.getPersistentRDDs.size <= cachedBefore + 1,
      "scoped verify must unpersist its shingle cache on return")
    assert(scoped.collect().toSeq == sessionCached.toSeq)
    // near-dup pair survives the 0.5 threshold; the unrelated pair does not
    assert(sessionCached.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
  }

  test("native minhash signature: deterministic, similarity-sensitive, total on edge cases") {
    val base = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 6).trim
    val docs = Seq(
      (0L, base), (1L, base), (2L, base + " tail"),
      (3L, "entirely different words everywhere"), (4L, ""), (5L, "one"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // every doc (even empty / sub-shingle-length text) gets a full signature
    assert(sigs.size == 6 && sigs.values.forall(_.length == 32))
    // identical text => identical signature (deterministic seeds)
    assert(sigs(0L) == sigs(1L))
    // near-dup shares far more minima than an unrelated doc
    def overlap(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(overlap(sigs(0L), sigs(2L)) > overlap(sigs(0L), sigs(3L)))
    // null text is dropped, matching the old HOF pipeline's inner-explode
    val withNull = Seq((9L, null: String)).toDF("doc_id", "text")
    assert(Dedup.minHashSignatures(withNull, "doc_id", "text").count() == 0)
  }

  test("simhash: identical texts agree, and hamming distance to a near-dup is small") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota"),
      (2L, "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simHash(col("text")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(0L), m(1L)) < hamming(m(0L), m(2L)))
    // absolute bound: a 7/8-token overlap near-dup stays within 16 of 64
    // bits — the band a simhash near-dup filter would actually use
    assert(hamming(m(0L), m(1L)) <= 16,
      s"planted near-dup hamming ${hamming(m(0L), m(1L))} > 16")
  }

  test("native cosine expression agrees with HOF cosine and handles nulls") {
    val df = Seq(
      (Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val rows = df.select(
      cosine_sim(col("a"), col("b")).as("native"),
      Similarity.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
    val withNull = df.limit(1).select(cosine_sim(lit(null).cast("array<float>"), col("b")))
    assert(withNull.head().isNullAt(0))
  }

  test("native cosine yields NULL for length-mismatched vectors (codegen + interpreted)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.CosineSimilarity
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // codegen path: ragged pair in a DataFrame
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).head().isNullAt(0))
    // interpreted path: direct eval
    val ragged = CosineSimilarity(
      Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType)),
      Literal.create(Array(1.0f), ArrayType(FloatType)))
    assert(ragged.eval(null) == null)
    val equal = CosineSimilarity(
      Literal.create(Array(1.0f, 0.0f), ArrayType(FloatType)),
      Literal.create(Array(1.0f, 0.0f), ArrayType(FloatType)))
    assert(math.abs(equal.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("lshTopK recovers planted cluster neighbours (recall 1 on clustered data)") {
    // two tight, well-separated clusters: members agree on every random
    // hyperplane w.h.p., so each cluster maps to one bucket and the ANN
    // answer within the bucket is the exact answer
    val mk = (base: Int, i: Int) =>
      Array.tabulate(8)(d => (if (d == base) 1.0f else 0.0f) + i * 0.005f)
    val vecs = ((0 until 10).map(i => (i.toLong, mk(0, i))) ++
      (10 until 20).map(i => (i.toLong, mk(4, i - 10)))).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id").isin(0, 10))
    val exact = Similarity.bruteForceTopK(queries, vecs, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.lshTopK(vecs, queries, dim = 8, k = 3, bits = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(exact.size == 6)
    assert((ann & exact).size == exact.size, s"planted recall < 1: $ann vs $exact")
  }

  test("bruteForceTopK ranks the exact nearest neighbour first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, 2)
      .orderBy("rnk").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top == Seq(1L, 2L))
  }

  test("ivfTopK finds the planted nearest neighbour within its probed list") {
    // two well-separated clusters around (1,0,...) and (0,1,...); with
    // nLists=2/nProbe=1 each query stays inside its own inverted list
    val mk = (base: Int, i: Int) =>
      Array.tabulate(4)(d => (if (d == base) 1.0f else 0.0f) + i * 0.01f)
    val vecs = ((0 until 10).map(i => (i.toLong, mk(0, i))) ++
      (10 until 20).map(i => (i.toLong, mk(1, i - 10)))).toDF("vec_id", "embedding")
    val top = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0), k = 3,
        nLists = 2, nProbe = 1)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    // all neighbours come from cluster 0 (ids 1..9), never cluster 1
    assert(top.nonEmpty && top.forall(_ < 10))
  }

  test("connectedComponents labels chain, clique, and pair correctly") {
    import graft.ops.Components
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)).toDF("a", "b")
    val cc = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // unconverged graphs fail loudly instead of returning partial labels
    val longChain = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Components.connectedComponents(longChain, "a", "b", maxIter = 3)
    }
  }

  test("tfidfTopTerms ranks a doc's distinctive term above corpus-common terms") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "common common common zebra"),
      (2L, "common words only here"),
      (3L, "common words again still"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'common' appears in every doc (idf = ln(1) = 0); doc 1's top term
    // must be its unique word despite 'common' having 3x the tf
    assert(top(1L) == "zebra")
  }

  test("multimodal decodeBatch appends per-row features; null media stays null") {
    import graft.queries.Multimodal
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "txt")
      .select(col("doc_id"), encode(col("txt"), "UTF-8").as("media"))
      .unionByName(Seq(3L).toDF("doc_id").withColumn("media", lit(null).cast("binary")))
    val out = Multimodal.decodeBatch(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[scala.collection.Seq[Float]]("features"))).toMap
    assert(out(1L).get.length == 16)
    assert(out(1L).get.head == 'a'.toInt / 255f)
    assert(out(2L).get.forall(_ == 0f))
    assert(out(3L).isEmpty)
  }

  test("quality profile counts planted duplicates and violations") {
    import graft.ops.Quality
    val df = Seq(
      (1L, 1, 5.0), (1L, 1, 6.0), // duplicate key
      (2L, 1, -3.0),              // negative value
      (3L, 1, 4.0))
      .toDF("k1", "k2", "v")
    val r = Quality.profile(df, Seq("k1", "k2"),
      Seq("neg_v" -> (col("v") < 0))).head()
    assert(r.getAs[Long]("n_rows") == 4)
    assert(r.getAs[Long]("n_dup_keys") == 1)
    assert(r.getAs[Long]("neg_v") == 1)
  }

  test("langId picks the marker-dominant language; fingerprint is stable") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el perro y la casa de la abuela"))
      .toDF("doc_id", "text")
    val langs = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en" && langs(2L) == "es")
    val fp1 = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getLong(0))
    val fp2 = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp1.toSeq == fp2.toSeq && fp1.distinct.length == 2)
  }

  test("embedding dedup keep-list: near-dups map to min id, singletons keep themselves") {
    // vectors 1 and 2 are near-identical; 3 is orthogonal (a singleton that
    // never enters the edge list and must still appear, kept, in the output)
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.05f), 0),
      (3L, Array(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.thresholdPairs(e, "label", "vec_id", "embedding",
      threshold = 0.35, chunks = 2, (x, y) => cosine_sim(x, y))
    val comp = graft.ops.Components.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "vec_id")
    val keep = e.select(col("vec_id"))
      .join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("keep_id"))
      .withColumn("kept", col("vec_id") === col("keep_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(keep.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)))
    // representative invariants: keep_id <= vec_id, and every keep_id is kept
    assert(keep.forall { case (v, k, _) => k <= v })
    val keptIds = keep.collect { case (v, _, true) => v }.toSet
    assert(keep.forall { case (_, k, _) => keptIds.contains(k) })
  }

  test("unigramNll: common-token docs score below rare-token docs; token math exact") {
    // 'a' appears 7 times in the corpus, each rare token once
    val docs = Seq(
      (1L, "a a a a"),        // all common -> lowest NLL
      (2L, "a a qq zz"),      // mixed
      (3L, "ww xx yy vv a")   // mostly rare -> highest NLL
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_tok")).toSeq == Seq(4L, 4L, 5L))
    val nll = out.map(_.getAs[Double]("nll"))
    assert(nll(0) < nll(1) && nll(1) < nll(2), s"NLL order wrong: ${nll.toSeq}")
    // doc 1: every token has p = 7/13 -> nll = round(1e6*ln(13/7))/1e6
    val expected = math.floor(-math.log(7.0 / 13.0) * 1e6 + 0.5) / 1e6
    assert(math.abs(nll(0) - expected) < 1e-9, s"${nll(0)} vs $expected")
  }

  test("unigramNll vocabulary cap: pruned terms score at the floor, never harsher") {
    val docs = Seq(
      (1L, "a a a a"),      // 'a' cnt=7 survives any cap here
      (2L, "a a qq zz"),    // qq/zz cnt=1 -> pruned at minCount=2
      (3L, "ww xx yy vv a")
    ).toDF("doc_id", "text")
    val exact = TextAnalysis.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[Double]("nll"))
    val capped = TextAnalysis.unigramNll(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id").collect().map(_.getAs[Double]("nll"))
    // all-common doc unchanged; rare-token docs soften (floor prob
    // minCount/total > true 1/total) but never harshen
    assert(capped(0) == exact(0))
    assert(capped(1) < exact(1) && capped(2) < exact(2),
      s"cap must soften rare-token NLL: $capped vs $exact")
    // floor = -ln(2/13) micro-nat-quantized for a pruned token
    val floorQ = math.floor(-math.log(2.0 / 13.0) * 1e6 + 0.5)
    val aQ = math.floor(-math.log(7.0 / 13.0) * 1e6 + 0.5)
    val want = math.floor((2 * aQ + 2 * floorQ) / 4 + 0.5) / 1e6
    assert(math.abs(capped(1) - want) < 1e-9, s"${capped(1)} vs $want")
  }

  test("chunkDocs: window/stride boundary arithmetic") {
    def doc(n: Int) = (1L, (1 to n).map(i => s"t$i").mkString(" "))
    def chunksOf(n: Int) = {
      val df = Seq(doc(n)).toDF("doc_id", "text")
      TextAnalysis.chunkDocs(df, "doc_id", "text", window = 64, stride = 48)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Int]("start_tok"),
          r.getAs[Int]("n_tok"), r.getAs[String]("chunk_text")))
    }
    // n=100: chunks at 0/48/96 with 64/52/4 tokens — no phantom 4th chunk
    val c100 = chunksOf(100)
    assert(c100.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((0, 0, 64), (1, 48, 52), (2, 96, 4)))
    assert(c100(2)._4 == "t97 t98 t99 t100")
    // every token is covered; consecutive chunks overlap by window-stride
    assert(c100(0)._4.endsWith("t64") && c100(1)._4.startsWith("t49"))
    // n < window: one short chunk
    assert(chunksOf(10).map(c => (c._1, c._3)).toSeq == Seq((0, 10)))
    // exact stride boundary n=96: starts 0 and 48, NOT a third empty chunk
    assert(chunksOf(96).map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((0, 0, 64), (1, 48, 48)))
  }
}
