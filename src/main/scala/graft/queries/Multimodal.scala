package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/featurized by a pluggable kernel.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): a deterministic fake that maps the first 16 bytes to a
  * normalized float feature vector. Everything around it — binary encoding,
  * metadata struct, per-partition batch execution — is the real pipeline
  * shape: swap [[StubCodec.decode]] for a JNI/codec call and nothing else
  * changes.
  */
object Multimodal {

  /** STUB codec — stands in for an image/audio decoder whose *construction*
    * is expensive (native lib load, model weights). Instantiated once per
    * partition by [[decodeBatch]], reused across that partition's rows. */
  final class StubCodec {
    def decode(bytes: Array[Byte]): Array[Float] =
      if (bytes == null) null
      else {
        val n = math.min(bytes.length, 16)
        Array.tabulate(16)(i => if (i < n) (bytes(i) & 0xff).toFloat / 255f else 0f)
      }
  }

  /** Batch decode via mapPartitions — the one place the library drops below
    * the DataFrame API, and the canonical reason to: per-partition codec
    * init amortized over the partition's rows, rows streamed (no
    * materialization of the whole partition). Input must carry a binary
    * `media` column; output appends `features: array<float>`. */
  def decodeBatch(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { rows =>
      val codec = new StubCodec // once per partition, NOT per row
      rows.map(r => Row.fromSeq(r.toSeq :+ codec.decode(r.getAs[Array[Byte]](mediaIdx))))
    }(Encoders.row(outSchema))
  }

  val defs: Map[String, Q] = Map(
    // Metadata path: binary payload + typed metadata struct (oracled).
    "q_multimodal_meta" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("media"),
          struct(
            length(encode(col("text"), "UTF-8")).as("n_bytes"),
            lit("text/plain").as("mime")).as("meta"))
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"), col("meta.mime").as("mime"))
        .orderBy("doc_id")),
    // Resize path: media -> smaller media (stub: keep the first quarter of
    // the bytes — stands in for a thumbnail/downsample kernel). The sliced
    // binary is materialized; the oracle checks the byte accounting.
    "q_multimodal_resize" -> ((s, dir) => {
      val media = encode(col("text"), "UTF-8")
      val target = greatest(ceil(length(media) / lit(4.0)).cast("int"), lit(1))
      tbl(s, dir, "documents")
        .select(col("doc_id"), media.as("media"), target.as("target"))
        .withColumn("resized", col("media").substr(lit(1), col("target")))
        .select(col("doc_id"),
          length(col("media")).as("orig_bytes"),
          length(col("resized")).as("resized_bytes"))
        .orderBy("doc_id")
    }),
    // Frame-sampling path: fixed 32-byte "frames", keep every 4th — the
    // video keyframe-sampling shape (binary slicing via sequence+transform,
    // then an indexed filter).
    "q_multimodal_frames" -> ((s, dir) => {
      val media = encode(col("text"), "UTF-8")
      // floor at 1: sequence(0, -1) would step DOWNWARD ([0,-1], SURVEY Q3)
      // for empty media; an empty doc is one empty frame instead
      val nFrames = greatest(ceil(length(media) / lit(32.0)).cast("int"), lit(1))
      tbl(s, dir, "documents")
        .select(col("doc_id"), media.as("media"), nFrames.as("n_frames"))
        .withColumn("frames",
          transform(sequence(lit(0), col("n_frames") - 1),
            i => col("media").substr(i * 32 + 1, lit(32))))
        .withColumn("sampled", filter(col("frames"), (_, i) => i % 4 === 0))
        .select(col("doc_id"), col("n_frames"),
          size(col("sampled")).as("n_sampled"),
          length(element_at(col("sampled"), 1)).as("first_frame_bytes"))
        .orderBy("doc_id")
    }),
    // Ingest path: REAL files from disk via the binaryFile source (one row
    // per file: path/length/content), fed straight into the per-partition
    // batch codec — the actual entry point of a media pipeline, replacing
    // the text-encoded stand-in the other queries use for oracle-ability.
    // The staged media directory is the scale-factor dir itself (its
    // parquet files are genuine binary payloads present at every SF).
    // Rows-only: DuckDB cannot scan arbitrary files as blobs; the byte
    // accounting is invariant-tested in MultimodalIngestSpec instead.
    "q_multimodal_ingest" -> ((s, dir) =>
      decodeBatch(
        graft.io.Sources.binaryFiles(s, dir, glob = "*.parquet")
          .select(
            regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
            col("length").as("n_bytes"),
            col("content").as("media")))
        .select(col("file_name"), col("n_bytes"),
          size(col("features")).as("n_features"),
          round(aggregate(col("features").cast("array<double>"), lit(0.0), (a, x) => a + x)
            / size(col("features")), 6)
            .as("feature_mean"))
        .orderBy("file_name")),
    // Decode path: binary -> feature vector via the per-partition batch
    // codec (rows-only).
    "q_multimodal_decode" -> ((s, dir) =>
      decodeBatch(
        tbl(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")))
        .select(col("doc_id"),
          size(col("features")).as("n_features"),
          round(aggregate(col("features").cast("array<double>"), lit(0.0), (a, x) => a + x)
            / size(col("features")), 6)
            .as("feature_mean"))
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         'text/plain' AS mime
         FROM documents ORDER BY doc_id""",
    "q_multimodal_resize" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT) AS orig_bytes,
         CAST(least(octet_length(encode(text)),
                    greatest(ceil(octet_length(encode(text)) / 4.0), 1)) AS INT) AS resized_bytes
         FROM documents ORDER BY doc_id""",
    "q_multimodal_frames" ->
      """SELECT doc_id,
         CAST(greatest(ceil(octet_length(encode(text)) / 32.0), 1) AS INT) AS n_frames,
         CAST(ceil(greatest(ceil(octet_length(encode(text)) / 32.0), 1) / 4.0) AS INT) AS n_sampled,
         CAST(least(octet_length(encode(text)), 32) AS INT) AS first_frame_bytes
         FROM documents ORDER BY doc_id"""
  )
}
