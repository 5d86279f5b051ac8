package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * All four strategies are pure DataFrame pipelines (shuffle on hash keys,
  * no driver-side state), so they scale horizontally:
  *
  *  - [[exactKeep]]: exact dedup by content hash — one shuffle on sha2.
  *  - [[minHashSignatures]] + [[lshCandidatePairs]]: MinHash + LSH banding —
  *    near-dup candidates without the O(n^2) cross join; cost is
  *    O(n * perms) + a self-join on (band, bucket) whose fan-out is bounded
  *    by bucket size.
  *  - [[simHash]]: 64-bit SimHash over token hashes; near-dups share most
  *    bits, found by joining on rotated prefixes or banding the bits.
  *  - [[charShingles]] + exact Jaccard verification for candidate pairs.
  */
object Dedup {

  // functions.substring only takes Int literals; Column.substr takes
  // Column positions, which the shingle lambda needs.
  private def shingleAt(text: Column, i: Column, n: Int): Column =
    text.substr(i, lit(n))

  /** Distinct character n-grams (shingles). Empty/short text yields the
    * whole string as its single shingle. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => shingleAt(text, i, n)))

  /** Distinct token n-grams (word shingles). For natural text these have a
    * far larger space than character n-grams, so unrelated documents share
    * few of them — which keeps MinHash band-collision rates (~ J^rows) low
    * and the LSH candidate set near-linear instead of quadratic. */
  def tokenShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Exact-dup groups: one row per distinct text, keeping the smallest id.
    * At scale: shuffle on sha2(text) — never on the raw text bytes. */
  def exactKeep(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: for each of `perms` hash functions, the minimum over
    * the document's shingle set of ((a_i * h + b_i) mod prime), where h is
    * a 32-bit hash of the shingle. Deterministic seeds.
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, perms: Int = 32): DataFrame = {
    val prime = 2147483647L // 2^31 - 1
    val rnd = new scala.util.Random(42)
    val coeffs = Seq.fill(perms)((1 + rnd.nextInt(Int.MaxValue - 1)).toLong,
                                 rnd.nextInt(Int.MaxValue).toLong)
    val sh = tokenShingles(col(textCol), shingleN)
    // hash(shingle) & 0xffffffffL: murmur3 as unsigned 32-bit.
    val hashed = transform(sh, s => hash(s).cast("long").bitwiseAND(lit(0xffffffffL)))
    // Explode + codegen'd min() aggregates instead of per-row array_min
    // lambdas: higher-order-function lambdas are CodegenFallback (boxed,
    // interpreted — measured ~3s/eval at 5k docs x 32 perms), while the
    // exploded shape is whole-stage-codegen'd and partial-aggregates
    // map-side, so the shuffle carries only `perms` longs per document.
    val exploded = docs.select(col(idCol).as("doc_id"), explode(hashed).as("h"))
    val aggs = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % prime).as(s"__m$i")
    }
    exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until perms).map(i => col(s"__m$i")): _*).as("signature"))
  }

  /** LSH banding: split the signature into bands of `rowsPerBand`, bucket by
    * the band's hash, self-join per (band, bucket) -> candidate pairs.
    * Returns distinct (id_a < id_b) candidate pairs.
    */
  def lshCandidatePairs(signatures: DataFrame, rowsPerBand: Int = 8): DataFrame = {
    val perms = 32
    val bands = perms / rowsPerBand
    val banded = signatures.select(
      col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        hash(slice(col("signature"), b * rowsPerBand + 1, rowsPerBand))
      }: _*)).as(Seq("band", "bucket")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens: sum +/-1 per bit weighted by
    * token hash bits, take the sign vector. */
  def simHash(text: Column): Column = {
    val tokens = split(text, "\\s+")
    val hashes = transform(tokens, t => xxhash64(t))
    // For each bit position, count tokens with that bit set vs total.
    val bitSums = (0 until 64).map { b =>
      aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)).cast("int"))
    }
    val n = size(tokens)
    // bit b of simhash = 1 iff more than half the tokens have bit b set
    (0 until 64).map { b =>
      when(bitSums(b) * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    inter / union
  }
}
