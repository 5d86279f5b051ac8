package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer induction (Sennrich et al.
  * 2016, arXiv:1508.07909) — the vocabulary-building step of an LLM data
  * pipeline, run as Spark aggregations.
  *
  * The scale move is the same one the reference implementation makes on
  * one machine: train on the WORD-FREQUENCY table, not the token stream.
  * A 100 TB corpus has trillions of running words but a Zipf-bounded
  * number of distinct word forms (tens of millions); `wordFreqs` is one
  * map-side-combined aggregation that compresses the corpus by ~10⁵, and
  * every merge round after it touches only that vocab-sized table:
  * count adjacent symbol pairs weighted by word frequency (a shuffle of
  * pair strings with partial aggregation), pick the arg-max pair
  * (count desc, pair asc — a 1-row driver decision, the same bounded
  * collect PQ/IVF fits make), and apply the merge to each word's symbol
  * array map-side. Per-round cost is O(|vocab|), independent of corpus
  * size; the corpus is read exactly once.
  *
  * Pair counting is POSITIONAL (each adjacent position counts, including
  * overlaps: "aaa" holds (a,a) twice), and merge application is greedy
  * left-to-right non-overlapping ("aaa" + (a,a) -> [aa, a]) — both
  * exactly the reference BPE semantics. Ties on count break on the pair
  * string ascending, making the whole merge sequence deterministic
  * across partitionings and engines: the catalog query's DuckDB oracle
  * RECOMPUTES the sequence independently (per-round CTEs replay the
  * merge state via delimiter-guarded string replace, each symbol wrapped
  * in its OWN delimiter pair so back-to-back matches never share one)
  * and must agree round for round.
  */
object Bpe {

  final case class Merge(merge_rank: Int, lhs: String, rhs: String,
                         n_occurrences: Long)

  /** Distinct word forms with occurrence counts — the vocab-sized
    * compressed intermediate everything else runs on. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs as "lhs rhs" strings, one per position.
    * Symbols never contain spaces (words are split ON spaces), so the
    * space-joined pair string is unambiguous and its ascending order is
    * the tie-break both engines share. */
  def pairsOf(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** One greedy left-to-right merge pass over a symbol array: every
    * non-overlapping (lhs, rhs) adjacency becomes the concatenated
    * symbol. A sequential fold IS the greedy scan — after a merge the
    * accumulator's tail is the merged symbol, so an immediately
    * following `rhs` cannot re-merge ("aaa" + (a,a) -> [aa, a]). */
  def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(lhs)
            && x === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(x))))

  /** Train `nMerges` merge rules. Each round: one vocab-sized pair
    * aggregation, a 1-row collect of the arg-max pair, one map-side
    * merge application. Symbol tables are persisted and swapped per
    * round (materialize-then-release, the PageRank lineage-truncation
    * pattern) so plan depth stays bounded at production merge counts
    * (30k-round vocabularies), and every cache is released on exit. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    var syms = wordFreqs(docs, textCol)
      .select(col("freq"), split(col("word"), "").as("syms"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var exhausted = false
      for (r <- 1 to nMerges if !exhausted) {
        val top = syms
          .select(col("freq"), explode(pairsOf(col("syms"))).as("pair"))
          .groupBy("pair").agg(sum("freq").as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true // no adjacent pairs left anywhere
        else {
          val Array(l, rt) = top.head.getString(0).split(" ", 2)
          merges += Merge(r, l, rt, top.head.getLong(1))
          val next = syms
            .select(col("freq"), applyMerge(col("syms"), l, rt).as("syms"))
            .persist()
          next.count() // materialize before dropping the parent cache
          syms.unpersist()
          syms = next
        }
      }
    } finally syms.unpersist()
    merges.toSeq
  }

  /** [[train]] with BATCHED merge selection: each count job collects the
    * top-`batchM` pairs and accepts a provably-safe batch of them, so a
    * 30k-merge production vocabulary costs ~30k/batch scheduler
    * round-trips instead of 30k. EXACTLY equivalent to the 1-per-round
    * sequence (BpeSpec pins equality on corpora with overlapping
    * winners); q_bpe_train's round-replay oracle independently verifies
    * whatever sequence ships.
    *
    * Why the batch rule is exact, not heuristic. From one round's counts,
    * scan the sorted (count desc, pair asc) top-M list and accept the
    * maximal PREFIX whose pairs are pairwise symbol-disjoint — where the
    * used-symbol set also contains each accepted pair's CONCATENATION
    * (a later candidate touching `lhs+rhs` would be counting symbols the
    * batch creates). Then truncate the accepted prefix to entries whose
    * count is STRICTLY greater than the stop candidate's count c_stop
    * (the first non-disjoint candidate, or the M-th count when the whole
    * window is disjoint — beyond-window pairs can tie it). Proof sketch:
    *  - an accepted pair's own count is unchanged by earlier batch merges
    *    (symbol-disjointness: no occurrence is consumed or created), so
    *    its recorded n_occurrences is its true round count;
    *  - any pair CHANGED or CREATED by an earlier batch merge shares a
    *    symbol with it, and every such old pair sorts at-or-after the
    *    stop position (the prefix is maximal), so its old count — an
    *    upper bound on the changed count, and via "each new-pair
    *    occurrence was an occurrence of an old overlapping pair" on every
    *    new pair's count — is <= c_stop;
    *  - strict c_i > c_stop therefore makes p_i beat every changed/new
    *    pair outright (no tie-break ambiguity), and equal-count accepted
    *    pairs fall in pair-asc scan order, which is exactly the
    *    sequential tie-break.
    * Worst case (c_1 == c_stop) the batch degenerates to the single
    * round winner — never slower than [[train]] in rounds, never
    * different in output. */
  def trainBatched(docs: DataFrame, textCol: String, nMerges: Int,
                   batchM: Int = 32): Seq[Merge] = {
    require(batchM >= 1, s"batchM must be >= 1: $batchM")
    var syms = wordFreqs(docs, textCol)
      .select(col("freq"), split(col("word"), "").as("syms"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var exhausted = false
      while (merges.size < nMerges && !exhausted) {
        val top = syms
          .select(col("freq"), explode(pairsOf(col("syms"))).as("pair"))
          .groupBy("pair").agg(sum("freq").as("n"))
          .orderBy(col("n").desc, col("pair").asc)
          .limit(batchM + 1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val cands = top.toSeq.map { r =>
            val Array(l, rt) = r.getString(0).split(" ", 2)
            (l, rt, r.getLong(1))
          }
          // maximal symbol-disjoint prefix (concatenations count as used)
          val used = scala.collection.mutable.Set.empty[String]
          val prefix = cands.take(batchM).takeWhile { case (l, r, _) =>
            val ok = !used(l) && !used(r) && !used(l + r)
            if (ok) { used += l; used += r; used += (l + r) }
            ok
          }
          // c_stop: the first non-accepted candidate's count. When the
          // whole window was accepted AND the limit returned fewer rows
          // than requested, the pair universe is COMPLETE — no unseen
          // pair exists to tie, so the entire prefix is safe.
          val cStopOpt = cands.drop(prefix.size).headOption.map(_._3)
            .orElse(if (cands.size >= batchM + 1) Some(cands.last._3)
                    else None)
          val safe0 = cStopOpt.fold(prefix)(cs => prefix.takeWhile(_._3 > cs))
          // always make progress: the round-1 winner is correct even on a
          // tie (no changed/new pairs exist before the first merge)
          val safe = if (safe0.isEmpty) prefix.take(1) else safe0
          val room = safe.take(nMerges - merges.size)
          room.foreach { case (l, r, c) =>
            merges += Merge(merges.size + 1, l, r, c)
          }
          val next = syms
            .select(col("freq"),
              room.foldLeft(col("syms")) { case (c0, (l, r, _)) =>
                applyMerge(c0, l, r)
              }.as("syms"))
            .persist()
          next.count() // materialize before dropping the parent cache
          syms.unpersist()
          syms = next
        }
      }
    } finally syms.unpersist()
    merges.toSeq
  }

  /** The merge table as a DataFrame — the trained tokenizer model
    * (rank-ordered rules), which is what a pipeline persists and ships. */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF().select(col("merge_rank"), col("lhs"), col("rhs"),
      col("n_occurrences")).orderBy("merge_rank")
  }

  /** The shared WITH-body of the replay oracles: per-round CTEs that
    * recompute the merge sequence from scratch — round k's state applies
    * round k-1's COMPUTED winner (scalar subqueries, not embedded
    * answers) via delimiter-guarded string replace, so a wrong Spark
    * merge at ANY round mismatches. Each symbol is wrapped in its OWN
    * delimiter pair ('|a||b||a|', never '|a|b|a|'): with a SHARED
    * delimiter, back-to-back occurrences of the winning pair overlap on
    * the middle '|' that the first match consumes, so replace skips the
    * second occurrence ('|a|b|a|b|' -> '|ab|a|b|') while the greedy fold
    * merges both ("abab" -> [ab, ab]) — private delimiters make matches
    * disjoint, and replace's left-to-right non-overlapping scan (which
    * never rescans emitted replacement text, so a merged symbol cannot
    * re-merge within its round) is then exactly the greedy fold. With
    * `finalState`, also emits s${n+1}: every word's symbol string after
    * ALL merges (what [[applyOracleSql]] tokenizes against). */
  private def roundCtes(nMerges: Int, finalState: Boolean): String = {
    // AS MATERIALIZED throughout: round k's state references round k-1's
    // winner through TWO scalar subqueries, so DuckDB's default CTE
    // inlining re-expands the whole prefix at every reference — an
    // exponential (~3^rounds) plan that took minutes at 8 rounds on a
    // 31-word vocab. Materializing pins each round to run exactly once
    // (the whole replay then costs milliseconds).
    def stateCte(k: Int): String = {
      val prev = if (k == 2) "base" else s"s${k - 1}"
      s"""s$k AS MATERIALIZED (SELECT word, freq, replace(s,
             (SELECT '|' || lhs || '||' || rhs || '|' FROM r${k - 1}),
             (SELECT '|' || lhs || rhs || '|' FROM r${k - 1})) AS s
           FROM $prev)"""
    }
    val rounds = (1 to nMerges).map { k =>
      val src = if (k == 1) "base" else s"s$k"
      val state = if (k == 1) "" else stateCte(k) + ",\n         "
      s"""${state}p$k AS (SELECT freq, unnest(list_transform(range(1, len(cs)),
             i -> cs[i] || ' ' || cs[i+1])) AS pair
           FROM (SELECT freq, list_filter(string_split(s, '|'),
                   x -> x <> '') AS cs FROM $src) q),
         r$k AS MATERIALIZED (SELECT $k AS merge_rank,
             split_part(pair, ' ', 1) AS lhs,
             split_part(pair, ' ', 2) AS rhs, CAST(n AS BIGINT) AS n_occurrences
           FROM (SELECT pair, sum(freq) AS n FROM p$k
                 GROUP BY pair ORDER BY n DESC, pair LIMIT 1) t)"""
    }.mkString(",\n         ")
    val tail = if (finalState) ",\n         " + stateCte(nMerges + 1) else ""
    s"""w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       wf AS MATERIALIZED (SELECT word, count(*) AS freq FROM w
              WHERE length(word) >= 1 GROUP BY word),
       base AS MATERIALIZED (SELECT word, freq,
           '|' || array_to_string(string_split(word, ''), '||') || '|' AS s
         FROM wf),
       $rounds$tail"""
  }

  /** STATIC DuckDB oracle for a `train(nMerges)` run — the recomputed
    * per-round winners, rank-ordered. */
  def oracleSql(nMerges: Int): String = {
    val union = (1 to nMerges).map(k => s"SELECT * FROM r$k")
      .mkString(" UNION ALL ")
    s"""WITH ${roundCtes(nMerges, finalState = false)}
       $union ORDER BY merge_rank"""
  }

  /** STATIC DuckDB oracle for [[tokenizeVocab]] + the per-document
    * token-count join: replays training, applies the full merge chain to
    * every vocab word, and re-aggregates token counts per document. */
  def applyOracleSql(nMerges: Int): String =
    s"""WITH ${roundCtes(nMerges, finalState = true)},
       vocab AS (SELECT word, len(list_filter(string_split(s, '|'),
           x -> x <> '')) AS word_tokens
         FROM s${nMerges + 1}),
       dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents)
       SELECT doc_id, count(*) AS n_words,
         CAST(sum(word_tokens) AS BIGINT) AS n_tokens
       FROM dw JOIN vocab USING (word)
       WHERE length(word) >= 1
       GROUP BY doc_id ORDER BY doc_id"""

  /** Every distinct word tokenized by the trained rules — the vocab-sized
    * table a corpus-wide apply BROADCASTS: the corpus-scale tokenize is
    * then one map-side join (tokenize 10⁷ vocab entries once, join 10¹²
    * running words against it), never a per-running-word merge chain. */
  def tokenizeVocab(docs: DataFrame, textCol: String,
                    merges: Seq[Merge]): DataFrame = {
    val syms = merges.foldLeft(split(col("word"), ""))(
      (c, m) => applyMerge(c, m.lhs, m.rhs))
    wordFreqs(docs, textCol).select(col("word"), size(syms).as("word_tokens"))
  }
}
