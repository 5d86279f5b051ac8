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
}
