package graft.queries

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/featurized by a pluggable kernel.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): a deterministic fake that maps the first 16 bytes to a
  * normalized float feature vector. Everything around it — binary encoding,
  * metadata struct, batch-friendly UDF signature (`Array[Byte] =>
  * Array[Float]`), per-partition execution — is the real pipeline shape:
  * swap the stub body for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** STUB decoder — stands in for image/audio decode + feature extraction. */
  private val decodeStub = udf((bytes: Array[Byte]) => {
    if (bytes == null) null
    else {
      val n = math.min(bytes.length, 16)
      Array.tabulate(16)(i => if (i < n) (bytes(i) & 0xff).toFloat / 255f else 0f)
    }
  })

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
    // Decode path: binary -> feature vector via the stub kernel (rows-only).
    "q_multimodal_decode" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        .withColumn("features", decodeStub(col("media")))
        .select(col("doc_id"),
          size(col("features")).as("n_features"),
          round(aggregate(col("features").cast("array<double>"), lit(0.0), (a, x) => a + x) / 16.0, 6)
            .as("feature_mean"))
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         'text/plain' AS mime
         FROM documents ORDER BY doc_id"""
  )
}
