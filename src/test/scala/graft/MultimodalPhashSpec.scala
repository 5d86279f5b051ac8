package graft

import graft.queries.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual dHash image near-dup detection (q_multimodal_phash):
  * bit-reproducible hashing, the band-PAIR recall GUARANTEE (any pair
  * with Hamming ≤ 6 dirties at most 6 of 8 byte-bands, so ≥ 2 bands
  * survive intact and the pair collides on that band pair — pigeonhole,
  * not probability), and planted-duplicate behavior. This is the
  * invariant tier standing in for a DuckDB oracle — DuckDB has no image
  * codec.
  */
class MultimodalPhashSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def codec = new Multimodal.PngCodec

  test("dhash is deterministic and content-derived") {
    val c = codec
    val a1 = c.dhash(c.encode("the quick brown fox jumps over the lazy dog" * 8 getBytes "UTF-8"))
    val a2 = codec.dhash(codec.encode("the quick brown fox jumps over the lazy dog" * 8 getBytes "UTF-8"))
    val b = c.dhash(c.encode("a completely different payload with other bytes!" * 8 getBytes "UTF-8"))
    assert(a1 == a2, "same payload, same hash — across codec instances")
    assert(a1 != b, "different payloads should not collide on this fixture")
  }

  test("a small payload perturbation moves the hash by a small Hamming distance") {
    val c = codec
    val base = ("lorem ipsum dolor sit amet " * 20).getBytes("UTF-8")
    val tweaked = base.clone(); tweaked(7) = 'X'.toByte
    val d = java.lang.Long.bitCount(c.dhash(c.encode(base)) ^ c.dhash(c.encode(tweaked)))
    // one changed pixel perturbs at most two adjacent cell means in one
    // row: at most a handful of comparison bits can flip
    assert(d <= 8, s"one-byte perturbation moved dHash by $d bits")
  }

  test("banding recall: every pair with hamming <= 6 is a candidate (pigeonhole)") {
    val out = SparkEntry.queries("q_multimodal_phash")(spark, sfDir)
      .select("doc_id", "dhash", "n_candidates", "n_near_dups").collect()
    assert(out.length > 0)
    val hashes = out.map(r => r.getLong(0) -> r.getLong(1))
    // brute-force ground truth over the collected hashes (fixture-sized)
    val within6 = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes if ida < idb
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (ida, idb)).toSet
    // a hamming<=6 pair dirties <=6 of 8 byte-bands, so >=2 bands match
    // exactly -> it MUST appear as a band-pair candidate; the per-doc
    // candidate counts must therefore dominate the true counts
    val trueCand = within6.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val (id, nc) = (r.getLong(0), r.getLong(2))
      assert(nc >= trueCand.getOrElse(id, 0L),
        s"doc $id: candidates $nc < true hamming<=6 partners " +
          s"${trueCand.getOrElse(id, 0L)}")
    }
    // near-dup counts are exactly the hamming<=6 partner counts
    val true6 = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes if ida < idb
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield Seq(ida, idb)).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(r.getLong(3) == true6.getOrElse(r.getLong(0), 0L),
        s"doc ${r.getLong(0)}: near-dup count mismatch")
    }
  }

  test("planted exact duplicates band together with hamming 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta " * 12),
      (2L, "alpha beta gamma delta " * 12), // exact duplicate of 1
      (3L, "totally unrelated content with different pixels " * 9))
      .toDF("doc_id", "text")
    val hashed = Multimodal.dhashBatch(
      Multimodal.encodePngBatch(
        docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
        .select(col("doc_id"), col("media")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hashed(1L) == hashed(2L), "identical payloads must hash equal")
    assert(java.lang.Long.bitCount(hashed(1L) ^ hashed(3L)) > 6,
      "unrelated fixture payloads should not read as near-dups")
  }
}
