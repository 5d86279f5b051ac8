package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Contiguous 0-based global row numbering in a defined total order —
  * the "assign every training example a stable id" primitive — WITHOUT
  * the single-task trap.
  *
  * The obvious spelling, `row_number().over(Window.orderBy(id))`, plans
  * an empty-partition-spec window: Spark moves the ENTIRE table into one
  * task (it even logs "No Partition Defined for Window operation") — the
  * job that works at sf0.1 and cannot finish at 100 TB. The scalable
  * shape is the classic two-job zipWithIndex contract:
  *
  *  1. range-repartition on the order column and sort within partitions —
  *     partition i holds a contiguous, sorted slice of the total order
  *     (the one genuinely required corpus shuffle);
  *  2. a per-partition count job (one long per partition to the driver —
  *     bounded at the partition count);
  *  3. a narrow map attaching `partitionOffset + localRank`.
  *
  * Steps 2–3 are exactly `RDD.zipWithIndex` (public Spark core API), and
  * running them on ONE RDD object lets the DAG scheduler reuse the
  * range-shuffle output across both jobs — the corpus is scanned and
  * shuffled once, counted from shuffle files, mapped from shuffle files.
  * This is the library's documented justified drop to the RDD API: the
  * per-partition offset+counter is imperative state, and the only
  * Column-API alternatives either single-task (global window) or
  * re-shuffle the corpus a second time (pid-keyed window after the range
  * exchange — pid can't be proven co-partitioned, so Catalyst inserts a
  * fresh hash exchange).
  *
  * Determinism: `orderCol` must be unique and non-null (a total order —
  * the same precondition every deterministic top-k in this library
  * states). Range boundaries come from seeded reservoir sampling and the
  * within-partition sort is total, so ids are a pure function of the
  * data: stable across runs and partition counts, and therefore
  * DuckDB-oracleable as `row_number() OVER (ORDER BY orderCol) - 1`.
  *
  * Downstream caveat (documented, inherent): the result is an
  * RDD-backed DataFrame — whole-stage codegen restarts below it, so
  * attach indexes at the END of a pipeline, not in the middle of one. */
object GlobalIndex {

  def withGlobalIndex(df: DataFrame, orderCol: String,
                      idxName: String = "global_idx"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = StructType(sorted.schema :+
      StructField(idxName, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
