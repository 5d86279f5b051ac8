package graft

import graft.ops.Compaction
import org.apache.spark.sql.functions._

/** Small-file compaction: layout accounting, the narrow rewrite, content
  * preservation, the no-op guard, and row-count validation. */
class CompactionSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), prefix).toString + "/data"

  test("compact collapses a many-small-file layout and preserves contents exactly") {
    val dir = freshDir("compact")
    val df = spark.range(0, 10000).select(col("id"), (col("id") % 97).as("k"))
    df.repartition(40).write.parquet(dir) // the small-file mess
    val before = Compaction.layoutStats(spark, dir)
    assert(before.nFiles == 40)

    // target sized so the plan lands at a small handful of files
    val target = before.totalBytes / 3 + 1
    val after = Compaction.compact(spark, dir, target)
    assert(after.nFiles == Compaction.planFileCount(before.totalBytes, target).toLong)
    assert(after.nFiles < before.nFiles)

    val got = spark.read.parquet(dir).orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L until 10000L).map(i => (i, i % 97)))
    // no staging residue left behind
    assert(!new java.io.File(dir + "__compact_tmp").exists())
    assert(!new java.io.File(dir + "__compact_old").exists())
  }

  test("compact is a no-op on an already-compact layout") {
    val dir = freshDir("compact_noop")
    spark.range(0, 1000).toDF("id").coalesce(1).write.parquet(dir)
    val before = Compaction.layoutStats(spark, dir)
    assert(before.nFiles == 1)
    // generous target: 1 file already meets it; the listing must be the
    // only IO (no rewrite -> identical stats, same file bytes)
    val after = Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(after == before)
  }

  test("planFileCount: ceil semantics and floor of one") {
    assert(Compaction.planFileCount(0, 100) == 1)
    assert(Compaction.planFileCount(100, 100) == 1)
    assert(Compaction.planFileCount(101, 100) == 2)
    assert(Compaction.planFileCount(1000, 100) == 10)
    intercept[IllegalArgumentException](Compaction.planFileCount(10, 0))
  }

  test("layoutStats of a missing directory is empty, not an error") {
    assert(Compaction.layoutStats(spark, "target/does_not_exist_xyz")
      == Compaction.LayoutStats(0, 0))
  }
}
