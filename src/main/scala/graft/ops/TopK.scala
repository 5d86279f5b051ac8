package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Exact top-k per group without the low-cardinality window trap.
  *
  * `row_number over (partition by g order by ...) <= k` plans as ONE sort
  * task per group: with few groups (return flags, priorities, regions) the
  * whole table funnels into a handful of straggler tasks — the job that
  * "works at sf0.1" and dies at 100 TB. Worse, the only built-in
  * alternative (a pre-window by (group, partition-id)) still shuffles the
  * FULL table once before pruning.
  *
  * This operator prunes before any shuffle: a narrow `mapPartitions` pass
  * keeps a bounded heap of the k best rows per group per input partition
  * (memory: groups × k rows — constant), so only k × partitions rows per
  * group ever reach the real window. This is the library's justified
  * imperative drop below the Column API: a running bounded heap is
  * genuine per-partition state no built-in expresses without a shuffle.
  *
  * Exactness: with the sort keys a TOTAL order (unique tiebreakers — also
  * what makes top-k deterministic in the first place), no pruned row can
  * sort strictly before any survivor with final rank <= k: a pruned row
  * has k rows of its own partition ahead of it, which would push any row
  * it precedes past rank k as well. Rank and dense_rank of survivors
  * count only strictly-preceding rows, so they are unchanged by dropping
  * rows that sort after. Keys must be non-null (nulls have no position in
  * a total order; filter them first).
  *
  * Select only needed columns before calling: the mapPartitions boundary
  * stops Catalyst's column pruning from reaching through it.
  */
object TopK {

  /** Rows with `row_number <= k` per group, the rank trio (`rn`, `rnk`,
    * `drnk`) attached. `keys` are (column, ascending) sort pairs forming
    * a total order; key and group columns must be non-null. */
  def rankTrio(df: DataFrame, groupCols: Seq[String],
               keys: Seq[(String, Boolean)], k: Int): DataFrame = {
    val schema = df.schema
    // the rank trio is appended by name; silently replacing caller data
    // (e.g. re-ranking a previous ranking's output) would lose columns
    Seq("rn", "rnk", "drnk").foreach(c =>
      require(!schema.fieldNames.contains(c),
        s"input already has a '$c' column — rename it before ranking"))
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val kIdx = keys.map { case (n, _) => schema.fieldIndex(n) }.toArray
    val kAsc = keys.map(_._2).toArray
    // negative = a sorts strictly before b
    def cmp(a: Row, b: Row): Int = {
      var i = 0
      while (i < kIdx.length) {
        val c = a.get(kIdx(i)).asInstanceOf[Comparable[Any]]
          .compareTo(b.get(kIdx(i)))
        if (c != 0) return if (kAsc(i)) c else -c
        i += 1
      }
      0
    }
    val pruned = df.mapPartitions { rows =>
      // heap max = the worst retained row, so one compare decides a skip
      val pqOrd: Ordering[Row] = (a, b) => cmp(a, b)
      val heaps = mutable.Map.empty[List[Any], mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val g = gIdx.map(r.get).toList
        val pq = heaps.getOrElseUpdate(g, mutable.PriorityQueue.empty(pqOrd))
        if (pq.size < k) pq.enqueue(r)
        else if (cmp(r, pq.head) < 0) { pq.dequeue(); pq.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
    val order = keys.map { case (n, asc) => if (asc) col(n).asc else col(n).desc }
    val globalW = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    pruned
      .withColumn("rn", row_number().over(globalW))
      .withColumn("rnk", rank().over(globalW))
      .withColumn("drnk", dense_rank().over(globalW))
      .filter(col("rn") <= k)
  }

  /** Rows with `row_number <= k` per group, rank attached as `rankCol`.
    * Same total-order requirement as [[rankTrio]]. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               keys: Seq[(String, Boolean)], k: Int, rankCol: String): DataFrame =
    rankTrio(df, groupCols, keys, k)
      .withColumnRenamed("rn", rankCol).drop("rnk", "drnk")
}
