package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Sampling decisions are a pure function of each row's id (md5 prefix →
  * uniform in [0,1)), never of an RNG stream: a row's keep/drop never
  * changes with partitioning, engine, corpus growth, or retry — the same
  * reproducibility contract as the content-hash split (LlmOps
  * `q_split_hash`). That also makes results expressible in ANSI SQL, so the
  * stratified sampler is DuckDB-oracleable where `df.stat.sampleBy` (RNG
  * acceptance sampling) is not.
  *
  * Scale shape: a map-only filter — no shuffle, no driver collect, no label
  * enumeration pass. Per-label fractions are caller-supplied (training
  * pipelines know their target mix; deriving it from data is a separate
  * profiling query), with a default for unlisted labels.
  */
object Sampling {

  /** Uniform-[0,1) hash of a row id: first 4 hex chars of md5(id:salt),
    * i.e. 16 bits, as a double in [0,1). Matches DuckDB's
    * `CAST('0x'||substring(md5(...),1,4) AS INT)/65536.0`. */
  def hashUnit(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 4), 16, 10)
      .cast("int") / 65536.0

  /** Keep each row with probability `fractions(label)` (or
    * `defaultFraction`), decided by the row-id hash. Deterministic and
    * engine-portable; a fraction bump from f1 to f2 keeps every previously
    * kept row (nested samples), which RNG-based sampling cannot offer. */
  def stratifiedHashSample(df: DataFrame, idCol: String, labelCol: String,
                           fractions: Map[Int, Double],
                           defaultFraction: Double,
                           salt: String = "graft-sample"): DataFrame = {
    val f = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, v)) =>
      when(col(labelCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(hashUnit(col(idCol), salt) < f)
  }
}
