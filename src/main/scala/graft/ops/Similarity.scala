package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[cosine]] — pure Column-DSL cosine (zip_with + aggregate, all double).
  * - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *   against every candidate; one pass over the big side, no shuffle of the
  *   candidate table. Correct at any scale where queries fit in a broadcast.
  * - [[lshBuckets]] / [[lshTopK]] — random-hyperplane LSH: b sign-bits
  *   bucket the space; top-k runs only within matching buckets. The scale
  *   path: candidate fan-in per query drops from N to N/2^bits (expected),
  *   and the bucket join is a plain shuffle join on the signature.
  */
object Similarity {

  /** Cosine similarity in double precision via zip_with + aggregate. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(ad, x => x * x), lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(bd, x => x * x), lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact top-k neighbors for each query vector (excluding self).
    * `sim` lets callers swap in the codegen'd native expression. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     sim: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = candidates.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", sim(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
  }

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Hyperplanes are deterministic (seeded) and broadcast as literals. */
  def lshBuckets(df: DataFrame, dim: Int, bits: Int = 8, seed: Long = 42): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    val emb = col("embedding").cast("array<double>")
    val sig = (0 until bits).map { b =>
      val plane = array(planes(b).map(v => lit(v)): _*)
      val dot = aggregate(zip_with(emb, plane, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("bucket", sig)
  }

  /** Approximate top-k: neighbors restricted to the query's LSH bucket. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, dim: Int, k: Int,
              bits: Int = 8): DataFrame = {
    val all = lshBuckets(embeddings, dim, bits)
    val q = lshBuckets(queries, dim, bits)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val scored = all.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("bucket"))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
  }
}
