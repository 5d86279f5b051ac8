package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ExtensionsTestBridge, GraftExtensions}
import org.apache.spark.sql.graft.CosineSimilarity.cosine_sim

/** SQL registration of the native expressions: the installer populates a
  * registry, and the SQL path resolves to the same Catalyst expression as
  * the Column API (identical results, codegen'd plan — no UDF fallback).
  */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("installer injects all functions into a fresh registry") {
    val names = Seq("cosine_similarity", "minhash_signature", "token_shingle_hashes")
    assert(ExtensionsTestBridge.installedNames(GraftExtensions, names) == names)
  }

  test("conf-path loading works: zero-arg constructor, same functions") {
    // mirrors what spark.sql.extensions does at session build:
    // classForName(name).getConstructor().newInstance() — a Scala object's
    // mirror class has no constructor, so this MUST be a zero-arg class
    val installer = Class.forName("org.apache.spark.sql.graft.GraftExtensions")
      .getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val names = Seq("cosine_similarity", "minhash_signature", "token_shingle_hashes")
    assert(ExtensionsTestBridge.installedNames(installer, names) == names)
  }

  test("MinHashSignature rejects non-positive shingleN/perms at construction") {
    import org.apache.spark.sql.graft.MinHashSignature.minhash_signature
    intercept[IllegalArgumentException](minhash_signature(col("text"), 0, 32))
    intercept[IllegalArgumentException](minhash_signature(col("text"), 3, 0))
  }

  test("SQL cosine_similarity equals the Column API on the same pairs") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.0f, 0.0f), Array(0.0f, 1.0f)),   // zero norm -> 0.0
      (3L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)) // ragged -> null
    ).toDF("id", "a", "b")
    df.createOrReplaceTempView("ext_pairs")
    val viaSql = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS sim FROM ext_pairs ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    val viaCol = df.select(col("id"), cosine_sim(col("a"), col("b")).as("sim"))
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql(1)._2.contains(0.0) && viaSql(2)._2.isEmpty)
  }

  test("SQL path resolves to the native expression — no UDF fallback") {
    GraftExtensions.register(spark)
    Seq((1L, Array(1.0f), Array(2.0f))).toDF("id", "a", "b")
      .createOrReplaceTempView("ext_native_check")
    val analyzed = spark.sql(
      "SELECT cosine_similarity(a, b) FROM ext_native_check")
      .queryExecution.analyzed
    val native = analyzed.expressions.flatMap(_.collect {
      case e: org.apache.spark.sql.graft.CosineSimilarity => e
    })
    assert(native.nonEmpty, s"SQL must resolve to CosineSimilarity:\n$analyzed")
  }

  test("SQL minhash/shingle functions match the Column API and reject non-literal ints") {
    GraftExtensions.register(spark)
    val df = Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val sqlRow = spark.sql(
      """SELECT minhash_signature(text, 3, 8) AS sig,
                token_shingle_hashes(text, 3) AS hs
         FROM ext_docs""").collect().head
    val colRow = df.select(
        org.apache.spark.sql.graft.MinHashSignature.minhash_signature(col("text"), 3, 8).as("sig"),
        org.apache.spark.sql.graft.TokenShingleHashes.token_shingle_hashes(col("text"), 3).as("hs"))
      .collect().head
    assert(sqlRow.getSeq[Long](0) == colRow.getSeq[Long](0))
    assert(sqlRow.getSeq[Long](1) == colRow.getSeq[Long](1))
    // foldable-but-not-yet-folded constants are fine (constant folding has
    // not run at function-builder time, so `1 + 2` arrives as an Add of
    // literals — the builder evals it like the optimizer would)
    val folded = spark.sql(
      "SELECT token_shingle_hashes(text, 1 + 2) AS hs FROM ext_docs").collect().head
    assert(folded.getSeq[Long](0) == colRow.getSeq[Long](1))
    // codegen specializes on the int parameters — a column there must fail
    // analysis loudly, not plan a broken kernel
    val err = intercept[Exception](
      spark.sql("SELECT token_shingle_hashes(text, CAST(id AS INT)) FROM ext_docs").collect())
    assert(err.getMessage.contains("INT constant"), err.getMessage)
  }
}
