package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Partitioned-layout materialization for dynamic partition pruning — the
  * OTHER half of the 100 TB scan-reduction story next to bucketing: a
  * fact table hive-partitioned on a derived key lets Catalyst prune whole
  * partition DIRECTORIES at runtime from a dim-side filter
  * (DynamicPartitionPruning: the dim join keys arrive via the reused
  * broadcast exchange and become a partition filter on the fact scan), so
  * a quarter-scoped query over a decade of data reads 3 months of files
  * — never planned, never opened. `q_join_dpp` exercises the path
  * end-to-end; PlanContractSpec pins the `dynamicpruning` scan filter.
  *
  * The layout is written once per (corpus, JVM) — the [[Bucketing]]
  * lifecycle: pay the partitioned write at layout time, every downstream
  * query prunes for free.
  */
object Dpp {

  private val layouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Idempotently materialize `df` hive-partitioned by `partCol` under the
    * JVM temp dir, keyed by `dir` (one layout per corpus per JVM), and
    * return the layout path. */
  def ensurePartitioned(dir: String, df: DataFrame, partCol: String): String =
    layouts.computeIfAbsent(dir, _ => {
      val path = new Path(System.getProperty("java.io.tmpdir"),
        "graft_dpp_" + Bucketing.tableSuffix(dir)).toString
      df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)
      path
    })
}
