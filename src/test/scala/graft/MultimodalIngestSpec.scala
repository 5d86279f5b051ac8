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
}
