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

  /** Exact-size-k weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006, A-ES): each row gets priority -ln(u)/w for a uniform
    * u, and the k smallest priorities win — inclusion probability
    * proportional to weight, in one pass. The Bernoulli samplers above
    * cannot hit a fixed budget ("exactly k docs / this many tokens");
    * this is the fixed-budget primitive.
    *
    * Derandomized u: the 16-bit md5 prefix mapped to (0,1] as
    * (h+1)/65537 — never 0, so -ln(u) is finite — making the sample a
    * pure function of (id, salt): stable across runs, engines, and
    * partitionings, and therefore DuckDB-oracleable (same md5/ln/floor
    * pipeline in SQL) where an RNG reservoir is not. -ln(u) is quantized
    * to integer micro-nats BEFORE the weight division (the catalog's
    * standard ln idiom); the priority compared across engines is then
    * micro-nats/w — one IEEE division of exact integers, bit-identical
    * everywhere. Ties (same 16-bit hash and weight) break on id.
    *
    * Scale shape: `orderBy(priority).limit(k)` plans as
    * TakeOrderedAndProject — a bounded k-row heap per partition and one
    * k·partitions merge, NO shuffle and no full sort (plan-pinned in
    * ReservoirSampleSpec). The corpus is read once, map-side. */
  def weightedReservoir(df: DataFrame, idCol: String, weightCol: String,
                        k: Int, salt: String = "graft-es"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 1, 4), 16, 10).cast("int")
    val qMicro = floor(-log((h + 1) / 65537.0) * 1e6 + 0.5d).cast("long")
    df.withColumn("priority",
        qMicro.cast("double") / col(weightCol).cast("double"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }
}
