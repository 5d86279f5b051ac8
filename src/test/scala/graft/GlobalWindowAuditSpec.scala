package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level audit of every GLOBAL window in main — the third member
  * of the Broadcast/Collect audit family: a window with no partition
  * spec (`Window.orderBy(...)` straight off the companion, or an empty
  * `Window.partitionBy()`) funnels its whole input through ONE sort
  * task, the classic works-at-sf0.1, dies-at-100TB plan. The two
  * legitimate sites both operate on provably tiny frames (per-shard
  * totals, merged heavy-hitter candidates); their boundedness arguments
  * previously lived only in comments — this spec makes a future
  * unbounded `Window.orderBy` fail the suite until it is either
  * partitioned or allowlisted here with a recorded bound.
  *
  * Matched forms: `Window.orderBy(` and `Window.partitionBy()` (empty
  * parens) — a window built as `Window.partitionBy(keys).orderBy(...)`
  * is partitioned and intentionally not matched.
  */
class GlobalWindowAuditSpec extends AnyFunSuite {

  // file -> (expected global-window sites, why each input is bounded)
  private val allow: Map[String, (Int, String)] = Map(
    "RangeJoin.scala" -> (2,
      "per-shard offset cumsums — <= nShards rows (+ out-of-span stragglers), fixed shard count, never data-sized"),
    "HeavyHitters.scala" -> (1,
      "Misra-Gries candidate total — <= k rows per partition merged, never data-sized"),
    "Mixing.scala" -> (1,
      "temperature-renormalization sums over the per-domain stats table — one row per mixture domain (schema-bounded)"),
    "Events.scala" -> (2,
      "Kaplan-Meier life table — rows are distinct whole-day durations (calendar-bounded), aggregated per-user then per-duration BEFORE either window"),
    "TextQueries.scala" -> (1,
      "Heaps-law cumulative curve — exactly HeapsBuckets rows by construction (prefix buckets, not data-sized)"))

  test("every global (unpartitioned) window in main is allowlisted with a boundedness argument") {
    val pat = java.util.regex.Pattern.compile(
      "Window\\.orderBy\\(|Window\\.partitionBy\\(\\s*\\)")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val found = walk(new java.io.File("src/main/scala")).flatMap { f =>
      // strip // comments AND scaladoc continuation lines (a window
      // spelled out inside a /** doc */ is prose, not a plan)
      val noComments = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .linesIterator.map(_.replaceAll("//.*", ""))
        .filterNot(l => { val t = l.trim; t.startsWith("*") || t.startsWith("/*") })
        .mkString("\n")
      val m = pat.matcher(noComments)
      val n = Iterator.continually(m.find()).takeWhile(identity).size
      if (n > 0) Some(f.getName -> n) else None
    }.toMap
    val unlisted = found.filter { case (f, n) => allow.get(f).forall(_._1 != n) }
    val stale = allow.filter { case (f, (n, _)) => !found.get(f).contains(n) }
    assert(unlisted.isEmpty,
      s"global window site(s) without a recorded bound (file -> actual " +
        s"count; partition it or update GlobalWindowAuditSpec.allow): $unlisted")
    assert(stale.isEmpty,
      s"stale global-window allowlist entries (expected counts): $stale")
  }
}
