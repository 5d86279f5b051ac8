package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain mixing ("data mixture") for training corpora: re-weight a corpus
  * so each domain contributes a caller-chosen share of the total training
  * units (chars/tokens), up-sampling scarce domains by repetition (multiple
  * "epochs" of a small domain) and down-sampling abundant ones — the step
  * that turns a raw crawl into a training mixture.
  *
  * Per domain d with target weight w_d, the repetition factor is
  * r_d = w_d * total_units / units_d, capped at `epochCap`. Every document
  * in d is emitted floor(r_d) times, plus once more iff
  * hashUnit(id) < frac(r_d) — the same deterministic hash-acceptance
  * contract as [[Sampling]] (no RNG: a document's copy count never changes
  * with partitioning or retries, and the expected unit share is exactly
  * w_d). Domains absent from the weight map are dropped (weight 0) — a
  * mixture definition is a whitelist.
  *
  * Scale shape: domain stats are one tiny aggregate broadcast back (no
  * collect, no driver loop); replication is a map-side
  * `explode(sequence(1, n_copies))` — the output amplification happens
  * inside each task, pipelined into the sink, nothing wide. `epochCap`
  * bounds worst-case amplification so a 3-document domain with a 30%
  * target cannot explode into millions of copies; the r_d ratio is pure
  * double arithmetic (identical IEEE ops on any engine), so the operator
  * stays ANSI-SQL-expressible and DuckDB-oracleable end to end.
  */
object Mixing {

  /** Emit each row `nCopies` times (0 drops the row) with a 1-based
    * `copy_idx` column. explode() of a NULL/empty array emits nothing, so
    * the n=0 case needs no separate filter. */
  def replicate(df: DataFrame, nCopies: Column): DataFrame =
    df.withColumn("copy_idx",
      explode(when(nCopies >= 1, sequence(lit(1), nCopies.cast("int")))))

  /** Re-mix `df` to the target unit `weights` over `domainCol`.
    * Output = input columns + `copy_idx` (which epoch of the document this
    * row is); a document appears 0..ceil(r_d) times. */
  def mixToWeights(df: DataFrame, domainCol: String, idCol: String,
                   unitCol: String, weights: Map[String, Double],
                   epochCap: Int = 16,
                   salt: String = "graft-mix"): DataFrame = {
    // weight lookup as a when-chain; the seed MUST be 0.0, not NULL, for
    // unlisted domains: least() skips NULL operands, so a NULL weight
    // would silently fall through to the epoch cap (r = epochCap!) instead
    // of dropping the domain. Weight 0 → r = 0 → zero copies.
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (k, v)) => when(col(domainCol) === lit(k), lit(v)).otherwise(acc)
    }
    // ONE stats subtree: per-domain units and the grand total both come
    // from a single aggregate pass — the total via a global window over
    // the already-aggregated (domains-cardinality) table, NOT a second
    // aggregate over df. Every DataFrame *reference* re-evaluates its
    // whole subtree (no automatic subplan sharing), so with df as an
    // expensive unmaterialized pipeline (q_curate_pipeline feeds the
    // deduped corpus in), a naive units+total formulation costs three
    // full upstream passes at 100 TB; this shape costs exactly two
    // (stats + emit — the classic trade; persist df to get one).
    // The empty-partition window moves only the tiny aggregate to one
    // task; integer sums keep the total exact either way.
    val stats = df.groupBy(domainCol).agg(sum(unitCol).as("_domain_units"))
      .withColumn("_total_units",
        sum("_domain_units").over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
    // Guard the units side too: a domain whose units sum to 0 (or NULL,
    // when every unit value is NULL) would make the raw ratio Infinity
    // (or NULL) — least() caps Infinity at epochCap and *skips* NULL, so
    // either degenerate domain would get full-cap replication instead of
    // being dropped. Zero-mass domains must emit nothing.
    val r = when(col("_domain_units") > 0,
      least(
        w * col("_total_units").cast("double") / col("_domain_units").cast("double"),
        lit(epochCap.toDouble))
    ).otherwise(lit(0.0))
    val extra = when(Sampling.hashUnit(col(idCol), salt) < (r - floor(r)), 1L)
      .otherwise(0L)
    replicate(
      df.join(broadcast(stats), domainCol)
        .withColumn("_n_copies", floor(r) + extra),
      col("_n_copies"))
      .drop("_domain_units", "_total_units", "_n_copies")
  }

  /** Temperature-scaled mixture (the multilingual sampling rule of
    * XLM/mBERT/mC4, Conneau & Lample 2019): domain weights are DERIVED
    * from the data as w_d ∝ units_d^α with α = 2^-sqrtIters (α = 0.5 for
    * the default one sqrt), flattening the head without hand-picking a
    * weight map — the standard knob between proportional (α=1) and
    * uniform (α=0) sampling. Same emit contract as [[mixToWeights]]:
    * floor(r_d) epochs + deterministic hash acceptance of the fraction.
    *
    * Oracle-exactness is why α is a power of ½ rather than a free double:
    * IEEE-754 requires sqrt to be CORRECTLY ROUNDED (pow is not), so
    * repeated sqrt is bit-identical on any engine, and the α-scaled
    * masses are then floor-quantized to integer micro-units so the
    * normalizing sum is exact long arithmetic — no summation-order
    * hazard between Spark's window and DuckDB's aggregate.
    *
    * Scale shape: identical to mixToWeights — one domains-cardinality
    * stats aggregate (+ two tiny window sums over it) broadcast back,
    * map-side explode for the epochs. */
  def mixToTemperature(df: DataFrame, domainCol: String, idCol: String,
                       unitCol: String, sqrtIters: Int = 1,
                       epochCap: Int = 16,
                       salt: String = "graft-mix-temp"): DataFrame = {
    require(sqrtIters >= 1 && sqrtIters <= 3,
      s"alpha = 2^-sqrtIters supports 0.5/0.25/0.125 only: $sqrtIters")
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val scaled = (1 to sqrtIters).foldLeft(col("_du").cast("double")) {
      (c, _) => sqrt(c)
    }
    val stats = df.groupBy(domainCol).agg(sum(unitCol).as("_du"))
      .withColumn("_sw", floor(scaled * lit(1000000.0)).cast("long"))
      .withColumn("_sum_sw", sum("_sw").over(w))
      .withColumn("_total", sum("_du").over(w))
    // association mirrors the oracle exactly: ((sw/sum_sw) * total) / du
    val r = when(col("_du") > 0,
      least(
        col("_sw").cast("double") / col("_sum_sw").cast("double")
          * col("_total").cast("double") / col("_du").cast("double"),
        lit(epochCap.toDouble))
    ).otherwise(lit(0.0))
    val extra = when(Sampling.hashUnit(col(idCol), salt) < (r - floor(r)), 1L)
      .otherwise(0L)
    replicate(
      df.join(broadcast(stats), domainCol)
        .withColumn("_n_copies", floor(r) + extra),
      col("_n_copies"))
      .drop("_du", "_sw", "_sum_sw", "_total", "_n_copies")
  }
}
