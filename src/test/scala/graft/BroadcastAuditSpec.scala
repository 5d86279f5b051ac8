package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level audit of every forced `broadcast()` hint in main: a hint
  * ships the build side to EVERY executor, so each site must carry an
  * argument for why that table stays bounded as the corpus grows — the
  * round-11 verdict found two hints (the uncapped bigram model, the
  * user-dimension retention cohort) that were silent scale hazards
  * passing every correctness check. This spec turns the class into a
  * compile-time-adjacent check: adding a `broadcast(` call site fails
  * the suite until the site is allowlisted HERE with its bound, and a
  * removed site fails until its stale entry is dropped.
  *
  * Bound classes, strongest first:
  *  - ONE_ROW     a single-row aggregate (count/min/total)
  *  - SCHEMA      enumerated domain: regions/nations/brands/labels/
  *                weeks/shards — cardinality fixed by the schema or the
  *                calendar, independent of row count
  *  - CAPPED      explicitly capped by construction (min-count cap,
  *                Misra-Gries k, df cap, top-k heap, fixed sample)
  *  - VOCAB       vocabulary-sized model table — grows ~log(corpus),
  *                the contract every LM scorer here shares
  *  - PROBE      caller-supplied probe/batch set, small by the API's
  *                contract (ANN query batches, incremental-dedup day
  *                batches); opt-outs documented where a caller may
  *                legitimately probe big
  *  - OUTPUT      bounded by the operator's own candidate/output set
  *                (near-dup candidate ids); the documented production
  *                fallback is a shuffle semi-join
  *  - ENTITY_DIM  an entity dimension (customers/products) — fits in
  *                the common case; the site documents the swap-to-
  *                shuffle story for when it does not
  */
class BroadcastAuditSpec extends AnyFunSuite {

  private val allow: Map[(String, String), String] = Map(
    ("Contamination.scala", "index") -> "CAPPED: df-capped benchmark gram index; broadcastIndex=false opt-out for big benchmarks",
    ("Dedup.scala", "ids") -> "OUTPUT: candidate-pair doc ids (near-dup volume, not corpus); production fallback = shuffle semi-join",
    ("Dedup.scala", "newBanded") -> "PROBE: incremental day-batch signatures; broadcastNew=false opt-out for large batches",
    ("Events.scala", "maxts") -> "ONE_ROW: max timestamp",
    ("Events.scala", "sizes") -> "SCHEMA: one row per signup WEEK (calendar-bounded)",
    ("HeavyHitters.scala", "candidates") -> "CAPPED: Misra-Gries summary, <= k rows per partition merged",
    ("LlmOps.scala", "minCnt") -> "ONE_ROW: min label count",
    ("LlmOps.scala", "quota") -> "SCHEMA: one row per label",
    ("Mixing.scala", "stats") -> "SCHEMA: one row per mixture domain",
    ("PageRank.scala", "n1") -> "ONE_ROW: vertex count",
    ("RangeJoin.scala", "offsets") -> "SCHEMA: one row per shard (fixed shard count)",
    ("Relational.scala", "freq") -> "SCHEMA: brand marginals (p_brand domain)",
    ("Relational.scala", "n") -> "SCHEMA: nation dimension (25 rows)",
    ("Relational.scala", "nb") -> "ONE_ROW: basket count",
    ("Relational.scala", "r") -> "SCHEMA: region dimension (5 rows)",
    ("Relational.scala", "region") -> "SCHEMA: region dimension (5 rows)",
    ("Relational.scala", "tbl") -> "ENTITY_DIM: part (p_partkey, p_brand) projection — product catalog; swap to shuffle join past executor memory",
    ("Relational.scala", "tot") -> "ONE_ROW: grand total",
    ("Similarity.scala", "probes") -> "PROBE: ANN query batch (API contract: probe sets are small)",
    ("Similarity.scala", "q") -> "PROBE: LSH query batch",
    ("Similarity.scala", "queries") -> "PROBE: brute-force/HOF query batch",
    ("Similarity.scala", "shortlist") -> "PROBE: per-probe ADC shortlist, <= probes x shortlist-k rows",
    ("StreamOps.scala", "cust") -> "ENTITY_DIM: stream-static enrichment dim; per-batch shuffle join is the documented swap when the dim outgrows executors",
    ("TextAnalysis.scala", "lm") -> "VOCAB: unigram LM table (min-df floor documented in unigramNll)",
    ("TextAnalysis.scala", "n") -> "ONE_ROW: corpus doc count",
    ("TextAnalysis.scala", "total") -> "ONE_ROW: token total",
    ("TextModels.scala", "docs") -> "ONE_ROW: doc-count aggregate (inline .agg)",
    ("TextModels.scala", "model") -> "VOCAB: vocab x class log-prob grid (classes schema-bounded)",
    ("TextModels.scala", "priors") -> "SCHEMA: one row per class",
    ("TextModels.scala", "totL") -> "SCHEMA: one row per class",
    ("TextModels.scala", "tots") -> "SCHEMA: one row per feature-model side (2)",
    ("TextModels.scala", "vSize") -> "ONE_ROW: vocab size",
    ("TextQueries.scala", "ca") -> "VOCAB: left unigram marginal",
    ("TextQueries.scala", "capped") -> "CAPPED: min-count-capped bigram table, <= total-pairs/cap rows (plan-contracted build side)",
    ("TextQueries.scala", "cb") -> "VOCAB: right unigram marginal",
    ("TextQueries.scala", "tot") -> "ONE_ROW: pair total",
    ("TextQueries.scala", "vocab") -> "VOCAB: distinct-token table (tf-idf df join)",
    ("Triangles.scala", "deg") -> "CAPPED: backbone degrees, <= k per vertex by the top-k backbone's construction")

  test("every forced broadcast() hint site is allowlisted with a boundedness argument") {
    val pat = java.util.regex.Pattern
      .compile("(?<![.\\w])broadcast\\(\\s*([A-Za-z_][A-Za-z0-9_]*)")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val found = walk(new java.io.File("src/main/scala")).flatMap { f =>
      val noComments = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .linesIterator.map(_.replaceAll("//.*", "")).mkString("\n")
      val m = pat.matcher(noComments)
      Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => (f.getName, m.group(1))).toList
    }.toSet
    val unlisted = found.diff(allow.keySet)
    val stale = allow.keySet.diff(found)
    assert(unlisted.isEmpty,
      s"NEW forced broadcast hint(s) without a recorded bound — add each " +
        s"to BroadcastAuditSpec.allow with its bound class: $unlisted")
    assert(stale.isEmpty,
      s"stale allowlist entries (hint removed or renamed): $stale")
  }
}
