package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact frequent-item mining by candidate generation + verification —
  * the two-pass pattern that makes "find every token above a frequency
  * threshold" feasible at corpus scale (stopword lists, boilerplate
  * tokens, hot-key discovery before a join).
  *
  * The naive plan — `groupBy(item).count` then filter — shuffles the FULL
  * item stream: every distinct token is a shuffle key, and at 100 TB the
  * token stream is trillions of rows with a vocabulary in the hundreds of
  * millions. But items above a φ = 1/(k+1) frequency fraction number at
  * most k, and a Misra–Gries summary (Misra & Gries 1982; mergeability:
  * Agarwal et al., PODS'12) finds a superset of them in ONE narrow pass
  * with k counters of bounded state per partition:
  *
  *  - pass 1 (`summaries`): each input partition keeps k (item, count)
  *    counters — on overflow all counters decrement by one, charging
  *    k+1 occurrences per decrement round, so any item with more than
  *    `rows(p) / (k+1)` occurrences in partition p survives with a
  *    positive counter. Summing partial summaries keeps the guarantee
  *    corpus-wide (undercount ≤ Σp rows(p)/(k+1) = N/(k+1)): every item
  *    with true count > N/(k+1) appears in SOME partition summary. Only
  *    ≤ k·partitions + partitions summary rows ever reach the shuffle.
  *  - pass 2 (`exact`): the candidate table (≤ k·partitions rows) is
  *    broadcast back over the item stream; exact counts are aggregated
  *    for candidates only — the shuffle carries at most k·partitions
  *    distinct keys instead of the vocabulary. The final filter
  *    `cnt · (k+1) > N` (exact long arithmetic) then emits precisely
  *    the true heavy hitters: the sketch can only add false candidates,
  *    never lose a true one, and the verify pass strips the false ones.
  *
  * Output is EXACT and deterministic — independent of partitioning,
  * arrival order, and k (k only tunes the threshold φ and the candidate
  * bound) — so the catalog query is fully DuckDB-oracled by the naive
  * GROUP BY ... HAVING SQL it replaces.
  *
  * This is the library's second justified imperative drop below the
  * Column API (the first: `TopK`'s bounded heap): a decrementing counter
  * bank is genuine bounded per-partition state no built-in aggregate
  * expresses without shuffling the full stream. N (the total item count)
  * rides along as one null-item row per partition, so pass 1 needs no
  * second scan for the denominator.
  */
object HeavyHitters extends Serializable {

  /** Per-partition Misra–Gries summaries over a single string column:
    * rows (item, cnt) with ≤ k item rows per input partition, plus one
    * (null, partitionRowCount) row per partition carrying the total.
    * Narrow (no shuffle); state is k counters regardless of input size. */
  def summaries(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val ds: Dataset[String] =
      items.select(col(itemCol).cast("string")).as[String](Encoders.STRING)
    ds.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      var total = 0L
      while (it.hasNext) {
        val w = it.next()
        total += 1
        counters.get(w) match {
          case Some(c) => counters.update(w, c + 1)
          case None if counters.size < k => counters.update(w, 1L)
          case None =>
            // decrement-all: removes k+1 units of count (the k counters
            // plus the arriving item), so rounds ≤ rows/(k+1) — O(k) per
            // round amortizes to O(1) per item
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.iterator.map { case (w, c) => (w, c) } ++
        Iterator((null: String, total))
    }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("item", "cnt")
  }

  /** All items whose count strictly exceeds N/(k+1), with exact counts.
    * Two scans of `items` total: the summary pass and the verify pass.
    * The denominator N (the null-item group of the summary aggregation)
    * rides onto every candidate row via an unpartitioned window over the
    * AGGREGATED summary — a single-task pass, but over a table bounded at
    * k·partitions + 1 rows by construction, and crucially ONE subtree:
    * splitting candidates/totals into two branches of the same aggregate
    * lets Catalyst push the isNull/isNotNull filters below the exchange,
    * the branches stop being identical, exchange reuse never fires, and
    * the corpus-scale summary pass runs twice (observed; pinned at 2
    * scans in HeavyHittersSpec). */
  def exact(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val summed = summaries(items, itemCol, k)
      .groupBy("item").agg(sum("cnt").as("cnt"))
    val candidates = summed
      .withColumn("n_total",
        sum(when(col("item").isNull, col("cnt")))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("item").isNotNull)
      .select(col("item"), col("n_total"))
    items.select(col(itemCol).cast("string").as("item"))
      .join(broadcast(candidates), "item")
      .groupBy("item", "n_total").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .select(col("item"), col("cnt"))
  }
}
