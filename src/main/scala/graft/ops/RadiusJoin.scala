package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed 2-D radius self-join — the spatial member of the join
  * family (beside the sorted range sweeps of [[RangeJoin]] and the
  * banded LSH joins of [[Dedup]]).
  *
  * Problem: all point pairs within Euclidean distance `r`, without the
  * all-pairs cross join. Standard grid method: bucket each point into a
  * square cell of side `r`; any pair within distance r differs by at
  * most 1 in each cell coordinate, so candidates come ONLY from the
  * 3 × 3 cell neighborhood join and are verified with the exact integer
  * predicate dx² + dy² ≤ r². Each unordered pair is found exactly once:
  * the probe side explodes to its 9 neighbor cells (distinct keys), the
  * build side stays in its one home cell, and the id_probe < id_build
  * filter picks a single orientation — no DISTINCT, no pair-keyed
  * shuffle anywhere (the only exchanges are the two cell-keyed ones
  * feeding the join and the point-keyed digest aggregation).
  *
  * Scale shape: shuffle is 9·n + n cell-keyed rows; per-cell work is
  * quadratic in occupancy, and occupancy is ~density·r² by
  * construction — callers pick r near the mean point spacing (the
  * catalog query derives r = ceil(√(bbox_area / n)) in-plan, so
  * expected occupancy stays O(1) at ANY corpus size and the join output
  * is O(n) pairs). Integer-exact end to end: coordinates are
  * milli-quantized longs, distances are long products, and the one
  * float op in the r derivation is a correctly-rounded IEEE
  * sqrt — bit-identical in DuckDB's replay.
  */
object RadiusJoin {

  /** Sign-safe floor division as a Column expression: Spark's integer
    * `/` and `div` truncate toward zero while grid bucketing needs the
    * floor, and the two diverge on negative coordinates. The
    * ((x % r) + r) % r nonnegative-mod form evaluates identically in
    * Spark and DuckDB (both % operators take the dividend's sign). */
  private def floorDiv(x: Column, r: Column): Column =
    (x - (((x % r) + r) % r)) / r

  /** Per-point neighbor digest where `r` rides the frame as a column
    * named "r" (one value per row — typically crossJoin-broadcast from a
    * 1-row derivation): (id, x, y, n_neighbors, nn_dist2). */
  def neighborDigestWithR(pts: DataFrame): DataFrame = {
    val home = pts.select(col("id"), col("x"), col("y"), col("r"),
      floorDiv(col("x"), col("r")).as("cx"),
      floorDiv(col("y"), col("r")).as("cy"))
    val probe = home.select(col("id"), col("x"), col("y"), col("r"),
        col("cx"), col("cy"),
        explode(expr("""flatten(transform(sequence(-1, 1), dx ->
          transform(sequence(-1, 1), dy ->
            named_struct('dx', dx, 'dy', dy))))""")).as("o"))
      .select(col("id"), col("x"), col("y"), col("r"),
        (col("cx") + col("o.dx")).as("kx"), (col("cy") + col("o.dy")).as("ky"))
    val pairs = probe.as("a").join(home.as("b"),
        col("a.kx") === col("b.cx") && col("a.ky") === col("b.cy") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))).as("d2"),
        col("a.r").as("r"))
      .where(col("d2") <= col("r") * col("r"))
    val per = pairs.select(explode(array(
        struct(col("ia").as("id"), col("d2")),
        struct(col("ib").as("id"), col("d2")))).as("e"))
      .select(col("e.id").as("id"), col("e.d2").as("d2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_neighbors"), min("d2").as("nn_dist2"))
    pts.select(col("id"), col("x"), col("y"))
      .join(per, Seq("id"), "left")
      .select(col("id"), col("x"), col("y"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        col("nn_dist2"))
  }
}
