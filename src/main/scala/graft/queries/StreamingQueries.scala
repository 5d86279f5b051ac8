package graft.queries

import graft.streaming.StreamOps
import org.apache.spark.sql.functions.col

/** Structured Streaming catalog entries (M4). Each runs a file-source
  * stream to completion with Trigger.AvailableNow into a memory sink and
  * returns the materialized result, so the DuckDB batch oracle applies.
  * Timestamps are emitted as epoch micros (BIGINT both sides).
  */
object StreamingQueries {

  val defs: Map[String, Q] = Map(
    "q_stream_tumbling" -> ((s, dir) =>
      StreamOps.tumbling(s, dir).orderBy("win_start", "event_type")),
    "q_stream_sliding" -> ((s, dir) =>
      StreamOps.sliding(s, dir).orderBy("win_start")),
    "q_stream_sessions" -> ((s, dir) =>
      StreamOps.sessions(s, dir).orderBy("user_id", "sess_start")),
    // Session windows HAND-BUILT on transformWithState event-time timers:
    // gap-evidence closes interior sessions, watermark-driven timer expiry
    // closes each user's final one — the eviction rule is part of the
    // oracle (non-final sessions always emit; final ones iff the final
    // watermark clears last+gap). See StreamOps.SessionTimeoutProcessor.
    "q_stream_session_timeout" -> ((s, dir) =>
      StreamOps.sessionTimeout(s, dir).orderBy("user_id", "sess_start")),
    "q_stream_dedup" -> ((s, dir) =>
      StreamOps.dedupKeys(s, dir).orderBy("user_id", "event_type")),
    "q_stream_stateful" -> ((s, dir) =>
      StreamOps.statefulCounts(s, dir).orderBy("user_id")),
    // Same state machine on Spark 4's transformWithState (typed state
    // handles + TTL/timers, RocksDB-mandatory) — the API a new stateful
    // pipeline should target; fMGWS above stays as the legacy surface.
    "q_stream_stateful_tws" -> ((s, dir) =>
      StreamOps.statefulCountsTws(s, dir).orderBy("user_id")),
    "q_stream_static_join" -> ((s, dir) =>
      StreamOps.staticJoin(s, dir).orderBy("c_mktsegment")),
    "q_stream_stream_join" -> ((s, dir) =>
      StreamOps.streamStreamJoin(s, dir).orderBy("click_id", "purchase_id")),
    // Left-outer stream-stream join: watermark-driven state eviction made
    // visible. Unmatched clicks null-emit (sentinel -1) exactly when the
    // final watermark (max ts - 1h) passes the end of their 30-min match
    // window — a deterministic rule, so the oracle reproduces the
    // watermark arithmetic in SQL.
    "q_stream_outer_join" -> ((s, dir) =>
      StreamOps.streamStreamOuterJoin(s, dir).orderBy("click_id", "purchase_id")),
    // Two stateful window aggregations CHAINED in one streaming query
    // (hour -> day roll-up; StreamOps.chainedAgg) — the multi-stateful-
    // operator path, append-mode emission rule replayed by the oracle.
    "q_stream_chained_agg" -> ((s, dir) =>
      StreamOps.chainedAgg(s, dir).orderBy("day_start", "event_type")),
    // Exactly-once sink without native transactionality: foreachBatch
    // writes each micro-batch into its OWN batch_id= partition with
    // idempotent dynamic overwrite, so a replayed batch (at-least-once
    // delivery after a crash) rewrites exactly its partition instead of
    // duplicating rows — replay-proven in StreamingSemanticsSpec. The
    // sink contents equal the streamed projection, so this IS oracled.
    "q_stream_foreach_batch" -> ((s, dir) => {
      val sink = graft.io.TempDirs.createDeletedOnExit("graft_fb_sink_")
      val purchases = StreamOps.eventsStream(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
      StreamOps.runForeachBatchSink(s, purchases, sink.getAbsolutePath)
        .drop("batch_id")
        .orderBy("event_id")
    }),
    // STREAMING ingest dedup (StreamOps.dedupIngest): the incremental-
    // dedup probe as a live stream — 4 real micro-batches of newly
    // arriving docs (the doc_id % 5 == 0 slice staged as id-range drops),
    // each probed against the SAME persisted signature index the batch
    // query uses (shared builder, memoized per corpus) and exact-Jaccard
    // verified into an idempotent batch_id-partitioned sink. Oracled by
    // the generated verify-replay SQL (shared candidate memo — the
    // per-chunk union provably equals the batch probe) EXTENDED with the
    // batch attribution: DuckDB recomputes each pair's batch_id from the
    // staged id-range arithmetic, so wrong chunking, a dropped batch, or
    // replay duplication all hash-mismatch.
    // The bloom content-seen check as a CONTINUOUS ingest gate: each
    // staged micro-batch probes the fit-once corpus sketch (broadcast
    // handle — the q_dedup_bloom artifact, shared memo) map-side, then
    // exact-verifies; output exact per batch, so the oracle is the plain
    // block join plus the staging's id-range batch arithmetic.
    "q_stream_bloom_gate" -> ((s, dir) =>
      StreamOps.bloomGate(s, dir, LlmOps.bloomSketchFor(s, dir))
        .orderBy("batch_id", "doc_id")),
    // Per-micro-batch KL(batch ‖ reference) drift gate against the
    // fit-once reference distribution (TextQueries.klRefFor over the
    // static 4/5ths of the corpus) — one alarm row per ingest batch.
    "q_stream_drift_gate" -> ((s, dir) =>
      StreamOps.driftGate(s, dir, TextQueries.klRefFor(s, dir))
        .orderBy("batch_id")),
    "q_stream_dedup_ingest" -> ((s, dir) => {
      val idx = LlmOps.incrementalIndexFor(s, dir)
      LlmOps.incrementalCandidatesFor(dir, () =>
        graft.ops.Dedup.incrementalCandidatePairs(s,
            tbl(s, dir, "documents").where(col("doc_id") % 5 === 0),
            "doc_id", "text", idx))
      StreamOps.dedupIngest(s, dir, idx)
        .orderBy("batch_id", "id_new", "id_corpus")
    })
  )

  /** Static oracles plus the GENERATED q_stream_dedup_ingest oracle
    * (present once either incremental query has recorded the corpus's
    * candidate pairs — emission rules in LlmOps). The batch_id column is
    * re-derived in SQL from the staging's id-range arithmetic:
    * step = (hi − lo) integer-div chunks, bucket = min(chunks−1,
    * (id − lo) div step), with the step = 0 degenerate case landing in
    * the LAST chunk (earlier ranges are empty by the same formula). */
  def oracles: Map[String, String] = {
    val n = StreamOps.DefaultChunks
    val bounds =
      s"""bounds AS (SELECT min(doc_id) AS lo,
           (max(doc_id) - min(doc_id)) // $n AS step
         FROM documents WHERE doc_id % 5 = 0)"""
    val batchExpr =
      s"""CAST(CASE WHEN (SELECT step FROM bounds) <= 0 THEN ${n - 1}
           ELSE least(${n - 1},
             (id_new - (SELECT lo FROM bounds)) // (SELECT step FROM bounds))
           END AS BIGINT)"""
    staticOracles ++
      LlmOps.incrementalReplayOracleSql(bounds, Some(("batch_id", batchExpr)))
        .map("q_stream_dedup_ingest" -> _)
  }

  private val staticOracles: Map[String, String] = Map(
    // q_text_kl_drift's arithmetic with source -> staged batch bucket
    // (the dedup_ingest id-range formula over the %5==0 stream): the
    // reference fit (kept top-24, <oov> collapse, marginals) is
    // RECOMPUTED from the static %5<>0 corpus — nothing recorded — and
    // each batch's contributions quantize to micro-nats before the
    // exact long sum, exactly as the Spark fold.
    "q_stream_drift_gate" ->
      s"""WITH bounds AS (SELECT min(doc_id) AS lo,
             (max(doc_id) - min(doc_id)) // ${StreamOps.DefaultChunks} AS step
           FROM documents WHERE doc_id % 5 = 0),
         bdocs AS (SELECT CAST(CASE
               WHEN (SELECT step FROM bounds) <= 0
                 THEN ${StreamOps.DefaultChunks - 1}
               ELSE least(${StreamOps.DefaultChunks - 1},
                 (doc_id - (SELECT lo FROM bounds))
                   // (SELECT step FROM bounds)) END AS BIGINT) AS batch_id,
             text FROM documents WHERE doc_id % 5 = 0),
         rtoks AS (SELECT
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
           FROM documents WHERE doc_id % 5 <> 0),
         rtc AS (SELECT term, count(*) AS c FROM rtoks
                 WHERE term <> '' GROUP BY 1),
         kept AS (SELECT term FROM rtc
                  ORDER BY c DESC, term ASC LIMIT ${TextQueries.KlVocabTopK}),
         rb AS (SELECT CASE WHEN term IN (SELECT term FROM kept) THEN term
                  ELSE '<oov>' END AS bucket, sum(c) AS cc
                FROM rtc GROUP BY 1),
         rtot AS (SELECT CAST(sum(cc) AS BIGINT) AS tot_c FROM rb),
         btoks AS (SELECT batch_id,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
           FROM bdocs),
         bcs AS (SELECT batch_id,
             CASE WHEN term IN (SELECT term FROM kept) THEN term
                  ELSE '<oov>' END AS bucket, count(*) AS cs
           FROM btoks WHERE term <> '' GROUP BY 1, 2),
         btot AS (SELECT batch_id, sum(cs) AS tot_b FROM bcs GROUP BY 1)
         SELECT b.batch_id, count(*) AS n_buckets,
           CAST(sum(b.cs) AS BIGINT) AS tot_tok,
           CAST(sum(CAST(floor(
             (CAST(b.cs AS DOUBLE) / t.tot_b) *
             ln((CAST(b.cs AS DOUBLE) * x.tot_c)
                / (CAST(t.tot_b AS DOUBLE) * r.cc)) *
             1000000 + 0.5) AS BIGINT)) AS BIGINT) AS kl_micro
         FROM bcs b JOIN rb r USING (bucket) JOIN btot t USING (batch_id)
              CROSS JOIN rtot x
         GROUP BY 1 ORDER BY 1""",
    // q_dedup_bloom's exact block-join oracle (same 16-token chunking)
    // plus the doc staging's id-range batch bucket (the dedup_ingest
    // bounds arithmetic over the %5==0 batch stream).
    "q_stream_bloom_gate" -> {
      val n = StreamOps.DefaultChunks
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n FROM documents),
         c AS (SELECT doc_id, toks, n,
           CAST(unnest(generate_series(0, CAST(floor((n - 1) / 16.0) AS BIGINT))) AS INT)
             AS chunk_idx
         FROM d),
         x AS (SELECT doc_id, chunk_idx,
           array_to_string(toks[chunk_idx * 16 + 1 : chunk_idx * 16 + 16], ' ')
             AS blk
         FROM c),
         corpus AS (SELECT DISTINCT blk FROM x WHERE doc_id % 5 <> 0),
         batch AS (SELECT doc_id, blk FROM x WHERE doc_id % 5 = 0),
         bounds AS (SELECT min(doc_id) AS lo,
           (max(doc_id) - min(doc_id)) // $n AS step
         FROM documents WHERE doc_id % 5 = 0),
         seen AS (SELECT doc_id, count(*) AS n_seen_blocks
                  FROM batch JOIN corpus USING (blk) GROUP BY doc_id),
         tot AS (SELECT doc_id, count(*) AS n_blocks
                 FROM batch GROUP BY doc_id)
         SELECT CAST(CASE WHEN (SELECT step FROM bounds) <= 0 THEN ${n - 1}
             ELSE least(${n - 1},
               (t.doc_id - (SELECT lo FROM bounds)) // (SELECT step FROM bounds))
             END AS BIGINT) AS batch_id,
           t.doc_id, t.n_blocks, s.n_seen_blocks,
           CAST(s.n_seen_blocks * 1000000 // t.n_blocks AS BIGINT) AS seen_ppm
         FROM seen s JOIN tot t USING (doc_id)
         ORDER BY batch_id, t.doc_id"""
    },
    "q_stream_tumbling" ->
      """SELECT epoch_us(time_bucket(INTERVAL 6 HOURS, ts)) AS win_start,
         event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY win_start, event_type
         ORDER BY win_start, event_type""",
    "q_stream_sliding" ->
      """WITH b AS (SELECT epoch_us(time_bucket(INTERVAL 6 HOURS, ts)) AS b6 FROM events),
         w AS (SELECT unnest([b6, b6 - 21600000000]) AS win_start FROM b)
         SELECT win_start, count(*) AS n FROM w
         GROUP BY win_start ORDER BY win_start""",
    "q_stream_sessions" ->
      """WITH x AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES THEN 1
                  ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (
           SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM x)
         SELECT user_id, epoch_us(min(ts)) AS sess_start, count(*) AS n_events
         FROM y GROUP BY user_id, sess ORDER BY user_id, sess_start""",
    // Same sessionization as q_stream_sessions + the timer-eviction rule:
    // non-final sessions (closed by gap evidence) always emit; a user's
    // final session emits iff the final watermark (max event ms - 1h)
    // reaches its deadline (last event ms + 30min). Millisecond floors
    // mirror Spark's watermark/timer arithmetic. The `<=` boundary (a
    // deadline landing EXACTLY on the watermark fires) matches the engine:
    // TimerStateImpl.getExpiredTimers treats a timer as expired while
    // expiry <= watermark — pinned to the millisecond by the planted
    // equality-boundary case in StreamingSemanticsSpec's timer test.
    "q_stream_session_timeout" ->
      """WITH x AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES THEN 1
                  ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (
           SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM x),
         s AS (
           SELECT user_id, sess, min(ts) AS mn, max(ts) AS mx, count(*) AS n
           FROM y GROUP BY user_id, sess),
         s2 AS (
           SELECT *, max(sess) OVER (PARTITION BY user_id) AS last_sess FROM s),
         m AS (SELECT max(epoch_ms(ts)) AS max_ms FROM events)
         SELECT user_id, epoch_us(mn) AS sess_start, n AS n_events
         FROM s2 CROSS JOIN m
         WHERE sess < last_sess
            OR epoch_ms(mx) + 1800000 <= max_ms - 3600000
         ORDER BY user_id, sess_start""",
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    // Chained-agg replay: hourly counts -> day roll-up, emitting only the
    // days the final watermark (max event ms - 1h) finalized. A day's
    // hours all end at-or-before the day's end, so the single
    // day_end <= watermark condition covers both operators' emission.
    "q_stream_chained_agg" ->
      """WITH m AS (SELECT max(epoch_ms(ts)) AS max_ms FROM events),
         h AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h_start,
                 event_type, count(*) AS n
               FROM events GROUP BY 1, 2),
         d AS (SELECT time_bucket(INTERVAL 1 DAY, h_start) AS d_start,
                 event_type, CAST(sum(n) AS BIGINT) AS n_events,
                 max(n) AS peak_hour_n, count(*) AS n_active_hours
               FROM h GROUP BY 1, 2)
         SELECT epoch_us(d_start) AS day_start, event_type, n_events,
           peak_hour_n, n_active_hours
         FROM d CROSS JOIN m
         WHERE epoch_ms(d_start + INTERVAL 1 DAY) <= max_ms - 3600000
         ORDER BY day_start, event_type""",
    "q_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_stream_stateful_tws" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_stream_stream_join" ->
      """SELECT l.event_id AS click_id, r.event_id AS purchase_id, l.user_id
         FROM events l JOIN events r ON l.user_id = r.user_id
         AND l.event_type = 'click' AND r.event_type = 'purchase'
         AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTES
         ORDER BY click_id, purchase_id""",
    "q_stream_foreach_batch" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_type = 'purchase' ORDER BY event_id""",
    // The watermark arithmetic in SQL: the join's watermark is the MIN of
    // the two sides' (max event time - 1h); an unmatched click null-emits
    // iff the end of its 30-min window is below that.
    "q_stream_outer_join" ->
      """WITH mx AS (
           SELECT least(
             (SELECT max(ts) FROM events WHERE event_type = 'click'),
             (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
             - INTERVAL 1 HOUR AS wm),
         matches AS (
           SELECT l.event_id AS click_id, r.event_id AS purchase_id, l.user_id
           FROM events l JOIN events r ON l.user_id = r.user_id
             AND l.event_type = 'click' AND r.event_type = 'purchase'
             AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTES),
         unmatched AS (
           SELECT l.event_id AS click_id, CAST(-1 AS BIGINT) AS purchase_id,
                  l.user_id
           FROM events l, mx
           WHERE l.event_type = 'click'
             AND l.ts + INTERVAL 30 MINUTES < mx.wm
             AND NOT EXISTS (
               SELECT 1 FROM events r
               WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
                 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTES))
         SELECT * FROM matches
         UNION ALL SELECT * FROM unmatched
         ORDER BY click_id, purchase_id"""
  )
}
