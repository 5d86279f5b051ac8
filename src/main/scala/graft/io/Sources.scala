package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Source discovery + readers (reference §2.1 S1-S4, quirks resolved).
  *
  * Decisions recorded per SURVEY §2.8:
  *  - Q1: the reference's eager hardcoded "dead read"
  *    (pyspark_script.py:30) is dropped — no input matching the pattern is a
  *    fast, explicit error, not a silent fallback.
  *  - Q2: an empty listing returns None instead of crashing (KeyError at
  *    pyspark_script.py:34).
  *  - Q9: the date regex is anchored to the basename start (`^(\d{8})`,
  *    the uploader's rule at upload_csv_to_s3.py:26), not the Glue script's
  *    match-anywhere (pyspark_script.py:43) — one rule, documented.
  *  - Explicit schema by default: inferSchema is an extra full pass over the
  *    data and nondeterministic on dirty input; at 100 TB it is not viable.
  *    A faithful inferSchema mode remains available.
  */
object Sources {

  /** Reconstructed sensor-readings schema (FIXTURES.md §A; the reference
    * infers it — pyspark_script.py:57-61). */
  val readingsSchema: StructType = StructType(Seq(
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("samples", IntegerType),
    StructField("temperature", DoubleType)))

  private val datePrefix = "^(\\d{8})".r
  private val basicDate = DateTimeFormatter.BASIC_ISO_DATE

  /** Parse the leading yyyyMMdd of a filename; None if absent/invalid. */
  def filenameDate(name: String): Option[LocalDate] =
    datePrefix.findFirstMatchIn(name).flatMap { m =>
      try Some(LocalDate.parse(m.group(1), basicDate))
      catch { case _: java.time.format.DateTimeParseException => None }
    }

  /** List files under `dir` with the given suffix (Hadoop FS — works for
    * file://, hdfs:// and s3a:// alike). Driver-side, like the reference's
    * ListObjectsV2 loop (pyspark_script.py:26-36). */
  def listFiles(spark: SparkSession, dir: String, suffix: String = ".csv"): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      .map(_.getPath.toString)
  }

  /** The newest file by filename-encoded date — the reference's incremental
    * contract ("process the latest measurement data"). Invalid dates are
    * skipped, empty input yields None (Q2). */
  def latestByFilenameDate(files: Seq[String]): Option[String] =
    files.flatMap { f =>
      val name = new Path(f).getName
      filenameDate(name).map(_ -> f)
    }.maxByOption(_._1).map(_._2)

  /** CSV reader: explicit schema (default) or reference-faithful inference. */
  def readCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = Some(readingsSchema)): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(sch) => base.schema(sch).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
  }

  /** ORC reader — columnar alternate to parquet; schema travels with the
    * files. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines reader with a MANDATORY explicit schema: inference would
    * be a second full pass and, worse, schema drift across 100 TB of
    * heterogeneous lines silently widens types. */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Binary-file ingest for multimodal payloads: each matched file becomes
    * one row of (path, modificationTime, length, content) — Spark's
    * `binaryFile` source, the real entry point for image/audio/video
    * corpora (the typed-metadata + `decodeBatch` plumbing in
    * `queries.Multimodal` consumes exactly this shape).
    *
    * Scale notes: listing and scheduling distribute like any file source
    * (one row per file; files never split), so media corpora parallelize
    * by file count. Whole files materialize in memory as single binary
    * cells — `spark.sql.sources.binaryFile.maxLength` (default 2 GiB)
    * bounds a row; shard long videos upstream. Pushdown works on the
    * METADATA columns (path/length/modTime filters prune before any byte
    * is read); content is only fetched for surviving rows. */
  def binaryFiles(spark: SparkSession, dir: String,
                  glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      // the driver's sf dirs are flat files, but scaled-up corpora
      // (ScaleUpMain) stage each table as a dataset DIRECTORY — without
      // recursion the ingest scan silently matches zero files there
      // (observed as the sf1 sweep's one empty result)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** Read the driver's events parquet with `ts` normalized to raw
    * epoch-NANOS LongType, whatever physical layout the file carries —
    * the single chokepoint for a column whose parquet type has already
    * changed under us once. Observed layouts:
    *
    *  - `TIMESTAMP(NANOS)` (driver testdata before 2026-08-13): Spark 4
    *    refuses it outright ([PARQUET_TYPE_ILLEGAL]) unless
    *    `spark.sql.legacy.parquet.nanosAsLong` is set, which surfaces it
    *    as LongType nanos;
    *  - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` (driver testdata since
    *    2026-08-13): surfaces as TimestampNTZType — scaled to nanos via
    *    `unix_micros` (sessions run UTC, so the NTZ→LTZ cast is the
    *    identity on the underlying micros);
    *  - plain INT64 nanos (ScaleUpMain-written scaled dirs): LongType.
    *
    * The nanos conf is set-and-left (parquet scans re-read SQLConf after
    * this returns, so a scoped restore could fire mid-plan); it is a
    * no-op for the non-NANOS layouts. SESSION-WIDE SIDE EFFECT: after the
    * first call, any OTHER TIMESTAMP(NANOS) parquet column read in the
    * same session surfaces as LongType nanos instead of failing with
    * [PARQUET_TYPE_ILLEGAL] — acceptable here because `events.ts` is the
    * only NANOS column in the corpus (TESTDATA.md documents the conf).
    *
    * The NTZ branch converts wall-clock micros to epoch micros via an
    * NTZ→LTZ cast, which is the identity ONLY under a UTC session
    * timezone; enforced below so a future non-UTC entry point fails fast
    * instead of silently shifting every timestamp by the zone offset. */
  def eventsRawNanos(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampNTZType | TimestampType =>
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "eventsRawNanos requires spark.sql.session.timeZone=UTC: the " +
            "NTZ->LTZ cast is only micros-preserving under UTC")
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(
        s"unsupported events.ts type $other in $path")
    }
  }
}
