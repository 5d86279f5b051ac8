package graft

import graft.io.Sources
import graft.queries.Multimodal
import org.apache.spark.sql.functions._

/** Binary-file ingest: real files on disk become (path, length, content)
  * rows, the byte accounting is exact, and the decode plumbing runs on
  * genuine file bytes. */
class MultimodalIngestSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("binaryFiles reads each matched file with exact byte accounting") {
    val rows = Sources.binaryFiles(spark, sfDir, glob = "*.parquet")
      .select(col("path"), col("length"), col("content")).collect()
    val onDisk = new java.io.File(sfDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length()).toMap
    assert(rows.length == onDisk.size, s"expected ${onDisk.size} files, got ${rows.length}")
    rows.foreach { r =>
      val name = r.getString(0).split('/').last
      val content = r.getAs[Array[Byte]]("content")
      assert(r.getLong(1) == onDisk(name), s"$name length column vs filesystem")
      assert(content.length.toLong == onDisk(name), s"$name content bytes vs filesystem")
      // parquet magic: real bytes arrived, not placeholders
      assert(new String(content.take(4), "US-ASCII") == "PAR1", s"$name magic")
    }
  }

  test("glob filter prunes non-matching files") {
    // the sf dir holds only parquet; a non-matching glob must yield nothing
    assert(Sources.binaryFiles(spark, sfDir, glob = "*.csv").count() == 0)
  }

  test("q_multimodal_ingest decodes every staged file deterministically") {
    val out1 = SparkEntry.queries("q_multimodal_ingest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val out2 = SparkEntry.queries("q_multimodal_ingest")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(out1.nonEmpty && out1 == out2)
    // every file produced a full 16-wide feature vector from its bytes
    assert(out1.forall(r => r(2) == 16))
  }

  test("golden file: PngCodec decodes a hand-crafted PNG to exact known stats") {
    // 3x2 grayscale, pixels {10..60}, written byte-by-byte by an
    // independent encoder (python zlib/struct, not javax.imageio) — if
    // the JDK reader mis-parsed dimensions, bit depth, or filtering,
    // these exact numbers could not come back
    val in = getClass.getResourceAsStream("/golden_3x2_gray.png")
    assert(in != null, "golden_3x2_gray.png missing from test resources")
    val bytes = in.readAllBytes(); in.close()
    val codec = new Multimodal.PngCodec
    assert(codec.decode(bytes) == ((3, 2, 210L)))
    // and the codec's own encode round-trips through its decode exactly
    val payload = Array[Byte](0, 1, 2, 3, 4, 5, 6, -1) // -1 = 255 unsigned
    val (w, h, sum) = codec.decode(codec.encode(payload))
    assert(w == 3 && h == 3, "8 bytes -> ceil(sqrt)=3 wide, 3 rows")
    assert(sum == (0 + 1 + 2 + 3 + 4 + 5 + 6 + 255).toLong)
    assert(codec.decode(null) == null && codec.encode(null) == null)
  }

  test("q_multimodal_decode emits real lossless image stats for every document") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // independent unsigned byte sum (test-local UDF over the raw bytes —
    // NOT the codec's arithmetic, and byte-exact for multi-byte UTF-8
    // where character-level sums would diverge)
    val byteSum = udf((b: Array[Byte]) => b.map(x => (x & 0xff).toLong).sum)
    val expected = docs.select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        byteSum(encode(col("text"), "UTF-8")).as("byte_sum"))
    val out = SparkEntry.queries("q_multimodal_decode")(spark, sfDir)
    assert(out.count() == docs.count())
    val joined = out.join(expected, "doc_id").collect()
    joined.foreach { r =>
      val (pb, png, w, h) = (r.getAs[Int]("payload_bytes"),
        r.getAs[Int]("png_bytes"), r.getAs[Int]("width"), r.getAs[Int]("height"))
      // a real PNG: starts compressed-smaller-or-modestly-larger, and the
      // frame geometry covers the payload with less than one spare row
      assert(png > 8, s"doc ${r.get(0)}: implausible png size $png")
      assert(w.toLong * h >= pb && w.toLong * (h - 1) < math.max(pb, 1),
        s"doc ${r.get(0)}: geometry ${w}x$h vs $pb payload bytes")
      assert(w == math.ceil(math.sqrt(math.max(pb, 1).toDouble)).toInt)
    }
    // losslessness: decoded pixel sum == unsigned byte sum of the payload
    // (padding pixels are zero), checked via an independent Spark-side
    // byte-sum rather than the codec's own arithmetic
    val mism = out.join(expected, "doc_id")
      .filter(col("px_sum") =!= col("byte_sum")).count()
    assert(mism == 0, s"$mism documents with px_sum != payload byte sum")
  }
}
