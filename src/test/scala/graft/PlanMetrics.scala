package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shared probe helper: execute a frame and report its shuffle exchanges.
  * Executes the frame's OWN QueryExecution via `toRdd` — `df.write` or
  * `df.count` would plan a fresh one whose metrics can't be read back. */
object PlanMetrics extends AdaptiveSparkPlanHelper {
  /** (exchange count, total bytes exchanged) after executing `df`. */
  def shuffled(df: DataFrame): (Long, Long) = {
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    val ex = collectWithSubqueries(qe.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    (ex.length.toLong, ex.map(_.metrics("dataSize").value).sum)
  }
}
