package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for graft's native Catalyst expressions.
  *
  * Two entry points for the same function set:
  *
  *   - `GraftExtensions` is a standard `SparkSessionExtensions` installer:
  *     `SparkSession.builder.withExtensions(GraftExtensions)` (or
  *     `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`)
  *     makes `cosine_similarity` / `minhash_signature` /
  *     `token_shingle_hashes` first-class SQL functions at session build —
  *     the deployment path for a shared cluster, where SQL users never
  *     touch the Scala API.
  *   - `GraftExtensions.register(spark)` injects the same builders into an
  *     EXISTING session's function registry (the driver owns the session
  *     builder in this harness, so catalog queries use this path). The
  *     registry write is idempotent — re-registering replaces the same
  *     builder.
  *
  * Integer parameters (`shingleN`, `perms`) must be foldable INT literals:
  * the expressions specialize their codegen on these values (loop bounds,
  * coefficient tables), so a per-row column argument cannot work. Non-literal
  * arguments fail analysis loudly rather than planning a broken kernel.
  *
  * Lives under `org.apache.spark.sql` because `SparkSession.sessionState`
  * (needed for post-hoc registration) is `private[sql]` in Spark 4.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  // Spark's conf-path loader does classForName(name).getConstructor()
  // .newInstance() — it needs a public zero-arg CLASS; a Scala object's
  // mirror class has no constructor and would crash session construction.
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions(extensions)
}

object GraftExtensions extends (SparkSessionExtensions => Unit) {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  // Accept any FOLDABLE int expression, not just a strict Literal —
  // constant folding has not run at function-builder time, so a user
  // writing `token_shingle_hashes(text, 1 + 2)` hands us an unfoldable-
  // looking Add of literals. `eval()` on a foldable expression is exactly
  // what the optimizer would do later; a foldable NULL still fails loudly.
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case e if e.foldable && e.dataType == IntegerType =>
      e.eval() match {
        case i: java.lang.Integer => i.intValue
        case _ => throw new IllegalArgumentException(
          s"$fn: $arg must be a non-null INT constant, got $e")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable INT constant (codegen specializes on it), got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(getClass.getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "_FUNC_(a, b) - cosine similarity of two float vectors in double precision; null on ragged lengths"),
      { args: Seq[Expression] =>
        require(args.length == 2, s"cosine_similarity expects 2 arguments, got ${args.length}")
        CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "_FUNC_(text[, shingleN, perms]) - MinHash signature (array<bigint>) over token shingles"),
      { args: Seq[Expression] =>
        require(args.length == 1 || args.length == 3,
          s"minhash_signature expects 1 or 3 arguments, got ${args.length}")
        if (args.length == 1) MinHashSignature(args(0), 3, 32)
        else MinHashSignature(args(0),
          intLit(args(1), "minhash_signature", "shingleN"),
          intLit(args(2), "minhash_signature", "perms"))
      }),
    (FunctionIdentifier("hilbert_d"),
      info("hilbert_d",
        "_FUNC_(x, y, bits) - Hilbert-curve distance of grid cell (x, y) in [0, 2^bits)^2"),
      { args: Seq[Expression] =>
        require(args.length == 3, s"hilbert_d expects 3 arguments, got ${args.length}")
        HilbertDistance(args(0), args(1), intLit(args(2), "hilbert_d", "bits"))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "_FUNC_(str) - Unicode NFC (canonical composition) normalization of a string"),
      { args: Seq[Expression] =>
        require(args.length == 1, s"nfc_normalize expects 1 argument, got ${args.length}")
        NfcNormalize(args(0))
      }),
    (FunctionIdentifier("token_shingle_hashes"),
      info("token_shingle_hashes",
        "_FUNC_(text, shingleN) - distinct 64-bit hashes of the text's token shingleN-grams"),
      { args: Seq[Expression] =>
        require(args.length == 2,
          s"token_shingle_hashes expects 2 arguments, got ${args.length}")
        TokenShingleHashes(args(0),
          intLit(args(1), "token_shingle_hashes", "shingleN"))
      })
  )

  override def apply(extensions: SparkSessionExtensions): Unit =
    functions.foreach(extensions.injectFunction)

  /** Register into an already-built session (idempotent). */
  def register(spark: SparkSession): Unit = functions.foreach {
    case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
  }
}
