package graft

import graft.ops.Triangles
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("perNode counts a planted K4-plus-pendant exactly") {
    // K4 on {1,2,3,4}: 4 triangles, every node in 3 of them; pendant 5
    // touches none and must be absent from the result
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Triangles.perNode(edges).orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("perNode is orientation-safe on a hub: star graph has no triangles") {
    val star = (2L to 40L).map(i => (1L, i)).toDF("src", "dst")
    assert(Triangles.perNode(star).count() == 0)
  }

  test("coPairs: hot-basket cap bounds the explode; small baskets unaffected") {
    // basket 1 is a planted hot basket (200 distinct items); baskets 2/3
    // are ordinary. With maxBasket=64 the hot basket contributes exactly
    // C(64,2) pairs over its 64 SMALLEST items — items 65..200 vanish —
    // while small-basket pairs survive verbatim and weights merge.
    val rows = ((1 to 200).map(i => (1L, i.toLong)) ++
      Seq((2L, 7L), (2L, 9L), (3L, 7L), (3L, 9L), (3L, 11L)))
      .toDF("basket", "item")
    val got = Triangles.coPairs(rows, "basket", "item", maxBasket = 64)
      .as[(Long, Long, Long)].collect()
      .map { case (s, d, w) => (s, d) -> w }.toMap
    val expected = (for { a <- 1L to 64L; b <- (a + 1) to 64L } yield {
      val extra = Seq((7L, 9L) -> 2L, (7L, 11L) -> 1L, (9L, 11L) -> 1L)
        .toMap.getOrElse((a, b), 0L)
      (a, b) -> (1L + extra)
    }).toMap
    assert(got == expected,
      s"${got.size} pairs vs expected ${expected.size}")
  }

  test("backbone keeps an edge if EITHER endpoint ranks it top-k") {
    // node 1's top-1 partner is 2 (w=9); node 3 ranks 1 as ITS top-1, so
    // (1,3) survives via 3's vote even though 1 prefers 2
    val pairs = Seq((1L, 2L, 9L), (1L, 3L, 5L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val got = Triangles.backbone(pairs, k = 1).orderBy("src", "dst")
      .as[(Long, Long)].collect().toSeq
    // 1 keeps (1,2); 2 keeps (1,2); 3 keeps (1,3)
    assert(got == Seq((1L, 2L), (1L, 3L)))
  }

  test("backbone tie-break is (weight desc, partner asc) — deterministic") {
    val pairs = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L))
      .toDF("src", "dst", "w")
    // every node sees two partners at w=5; top-1 keeps the smaller id:
    // 1 keeps 2, 2 keeps 1 -> (1,2); 3 keeps 1 -> (1,3)
    val got = Triangles.backbone(pairs, k = 1).orderBy("src", "dst")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (1L, 3L)))
  }
}
