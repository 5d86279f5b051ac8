package graft.io

import org.apache.spark.sql.DataFrame

/** Parquet spillover for verify-replay oracle recordings that exceed the
  * inline-literal cap.
  *
  * The catalog's generated oracles record the output of genuinely
  * non-SQL-expressible kernels (xxhash64 SimHash signatures, image-codec
  * dHashes, PNG DEFLATE lengths) and let DuckDB recompute everything
  * downstream from them. Below the cap those recordings ship as SQL
  * `VALUES` literals — self-contained, no file dependency. Above it the
  * old behavior was a rows-only fallback (the round-14/15 sf1 sweeps'
  * three withheld queries). This helper closes that gap: the recording is
  * written ONCE per (corpus, artifact) as a small parquet the generated
  * oracle reads back with `read_parquet`, so the replay stays exact at
  * ANY corpus size.
  *
  * Trust boundary is unchanged: exactly the kernel output that already
  * entered as literals is trusted as recorded; the whole pairing /
  * derivation stage is still recomputed by DuckDB from the sidecar.
  * Scale shape is strictly BETTER than the literal path — the frame is
  * written by executors (one narrow job, no driver collect at all) and
  * its size is one row per document, not per pair.
  *
  * Lifecycle mirrors the scaled corpora: sidecars live under
  * `java.io.tmpdir/graft_replay/<corpus-key>/` and are overwritten per
  * JVM on first use, so a stale recording from a previous session can
  * never back a fresh run's oracle.
  */
object ReplaySidecar {

  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Deterministic sidecar location for (corpus dir, artifact name).
    * The corpus key keeps the full dir legible (sanitized, length-capped
    * with a hash suffix) so concurrent corpora never collide. */
  def sidecarPath(dir: String, name: String): String = {
    val sane = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val key =
      (if (sane.length > 64) sane.takeRight(64) else sane) +
        "_" + java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(dir))
    s"${sys.props("java.io.tmpdir")}/graft_replay/$key/$name"
  }

  /** Write `df` to the sidecar path for (dir, name) once per JVM and
    * return the path; later calls return the memoized path without
    * re-evaluating `df`. */
  def writeOnce(dir: String, name: String)(df: => DataFrame): String =
    written.computeIfAbsent(s"$dir#$name", _ => {
      val p = sidecarPath(dir, name)
      df.coalesce(1).write.mode("overwrite").parquet(p)
      p
    })

  /** SQL-escape a sidecar path for interpolation into a generated
    * oracle (tmpdir is system-controlled, but belt-and-braces). */
  def sqlPath(path: String): String = path.replace("'", "''")
}
