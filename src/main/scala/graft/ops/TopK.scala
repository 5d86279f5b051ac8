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
  * (memory: groups × k rows, with the group count HARD-CAPPED at
  * `maxGroups` — past the cap a task stops pruning and passes rows
  * through, exact but unpruned), so only k × partitions rows per group
  * ever reach the real window. This is the library's justified
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
object TopK extends Serializable {

  /** Spark SQL's binary ordering: unsigned lexicographic, then by length. */
  private def compareBinary(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Spark SQL sort semantics for a heap key: `-0.0` and `0.0` compare
    * EQUAL (Java `compareTo` orders them, which could prune a row the
    * window would rank <= k), and binary columns order unsigned
    * lexicographically (`byte[]` is not `Comparable`). NaN sorts after
    * every other double on both sides (Java and Spark agree). */
  private def cmpValues(av: Any, bv: Any): Int = (av, bv) match {
    case (x: Array[Byte], y: Array[Byte]) => compareBinary(x, y)
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.compare(x + 0.0d, y + 0.0d) // +0.0 folds -0.0 into 0.0
    case (x: java.lang.Float, y: java.lang.Float) =>
      java.lang.Float.compare(x + 0.0f, y + 0.0f)
    case _ => av.asInstanceOf[Comparable[Any]].compareTo(bv)
  }

  /** Rows with `row_number <= k` per group, the rank trio (`rn`, `rnk`,
    * `drnk`) attached. `keys` are (column, ascending) sort pairs forming
    * a total order; key and group columns must be non-null.
    *
    * `maxGroups` bounds per-task memory (heaps hold groups x k rows): when
    * a task sees more distinct groups than that, it stops pruning and
    * passes its remaining rows through untouched — the downstream window
    * recomputes ranks over whatever reaches it, so the result is still
    * exact and high-cardinality inputs degrade gracefully to the plain
    * window plan instead of blowing up executor memory. (This operator
    * only WINS on low-cardinality groups — with many groups the window's
    * hash partitioning has no stragglers to fix.) */
  def rankTrio(df: DataFrame, groupCols: Seq[String],
               keys: Seq[(String, Boolean)], k: Int,
               maxGroups: Int = 65536): DataFrame = {
    require(maxGroups > 0, s"maxGroups must be positive: $maxGroups")
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
        val c = cmpValues(a.get(kIdx(i)), b.get(kIdx(i)))
        if (c != 0) return if (kAsc(i)) c else -c
        i += 1
      }
      0
    }
    val pruned = df.mapPartitions { rows =>
      // heap max = the worst retained row, so one compare decides a skip
      val pqOrd: Ordering[Row] = (a, b) => cmp(a, b)
      val heaps = mutable.Map.empty[List[Any], mutable.PriorityQueue[Row]]
      var passthrough: Iterator[Row] = Iterator.empty
      var pruning = true
      while (pruning && rows.hasNext) {
        val r = rows.next()
        val g = gIdx.map(r.get).toList
        heaps.get(g) match {
          case Some(pq) =>
            if (pq.size < k) pq.enqueue(r)
            else if (cmp(r, pq.head) < 0) { pq.dequeue(); pq.enqueue(r) }
          case None if heaps.size < maxGroups =>
            val pq = mutable.PriorityQueue.empty(pqOrd)
            pq.enqueue(r)
            heaps.put(g, pq)
          case None =>
            // group-cardinality bound hit: stop pruning this task, forward
            // the rest unmodified (exact — the window re-ranks everything)
            passthrough = Iterator.single(r) ++ rows
            pruning = false
        }
      }
      heaps.valuesIterator.flatMap(_.iterator) ++ passthrough
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
               keys: Seq[(String, Boolean)], k: Int, rankCol: String,
               maxGroups: Int = 65536): DataFrame =
    rankTrio(df, groupCols, keys, k, maxGroups)
      .withColumnRenamed("rn", rankCol).drop("rnk", "drnk")
}
