package graft

import graft.ops.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def v1 = Seq(
    (1L, Option("a"), Option(10.0)), // unchanged -> dropped
    (2L, Option("b"), Option(20.0)), // value update
    (3L, Option("c"), Option(30.0)), // deleted
    (4L, None: Option[String], Option(40.0)), // null -> value update
    (5L, Option("e"), None: Option[Double])   // null == null -> dropped
  ).toDF("k", "s", "p")

  private def v2 = Seq(
    (1L, Option("a"), Option(10.0)),
    (2L, Option("b"), Option(25.0)),
    (4L, Option("d"), Option(40.0)),
    (5L, Option("e"), None: Option[Double]),
    (6L, Option("f"), Option(60.0)) // insert
  ).toDF("k", "s", "p")

  test("diff classifies I/U/D and drops unchanged rows (null-safe)") {
    val got = Cdc.diff(v1, v2, Seq("k")).orderBy("k")
      .select("op", "k", "old_s", "new_s", "old_p", "new_p")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("U", 2L), ("D", 3L), ("U", 4L), ("I", 6L)))
  }

  test("old/new columns carry both versions, null-padded on absent side") {
    val rows = Cdc.diff(v1, v2, Seq("k")).collect()
      .map(r => r.getLong(r.fieldIndex("k")) -> r).toMap
    val u = rows(2L)
    assert(u.getDouble(u.fieldIndex("old_p")) == 20.0 &&
      u.getDouble(u.fieldIndex("new_p")) == 25.0)
    val d = rows(3L)
    assert(d.isNullAt(d.fieldIndex("new_s")) &&
      d.getString(d.fieldIndex("old_s")) == "c")
    val i = rows(6L)
    assert(i.isNullAt(i.fieldIndex("old_s")) &&
      i.getString(i.fieldIndex("new_s")) == "f")
  }

  test("roundtrip: applying the recovered changelog reproduces v2") {
    val log = Cdc.diff(v1, v2, Seq("k"))
    val upserts = log.where($"op" =!= "D")
      .select($"k", $"new_s".as("s"), $"new_p".as("p"))
    val deletes = log.where($"op" === "D").select("k")
    val rebuilt = graft.ops.Merge.upsert(v1, upserts, Seq("k"))
      .join(deletes, Seq("k"), "left_anti")
    val a = rebuilt.orderBy("k").collect().toSeq
    val b = v2.orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("mismatched schemas and key-only tables are rejected") {
    intercept[IllegalArgumentException] {
      Cdc.diff(v1, v2.withColumnRenamed("p", "q"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Cdc.diff(v1.select("k"), v2.select("k"), Seq("k"))
    }
  }
}
