package graft

import graft.io.{Sinks, Sources}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Round-trip every interchange format the engine speaks: values, types,
  * and row sets must survive parquet, orc, json-lines, and csv (the text
  * formats via explicit read schemas — inference is banned at scale). */
class FormatRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "alpha", 1.5, true),
    (2L, "beta,with,commas", -2.25, false),
    (3L, "gamma \"quoted\"", 0.0, true))

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("v", DoubleType), StructField("flag", BooleanType)))

  test("parquet/orc/json/csv round-trip values and types") {
    val df = rows.toDF("id", "s", "v", "flag")
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toFile
      dir.deleteOnExit()
      val path = new java.io.File(dir, "data").getAbsolutePath
      Sinks.writeFormat(df, path, fmt, SaveMode.Overwrite)
      val back = fmt match {
        case "parquet" => spark.read.parquet(path)
        case "orc" => Sources.readOrc(spark, path)
        case "json" => Sources.readJsonLines(spark, path, schema)
        case "csv" => spark.read.option("header", "true").schema(schema).csv(path)
      }
      assert(back.schema == schema, s"$fmt schema drifted: ${back.schema}")
      val got = back.as[(Long, String, Double, Boolean)].collect().sortBy(_._1)
      assert(got.toSeq == rows, s"$fmt round-trip mismatch: ${got.toSeq}")
    }
  }
}
