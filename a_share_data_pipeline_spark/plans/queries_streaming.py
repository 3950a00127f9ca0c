"""Streaming-backed catalog queries (SURVEY.md M5, T2/T5).

Each query materializes a real Structured Streaming run: events are
landed as files, read back with a file-source stream, processed through
windowed / stateful operators, executed to completion with
Trigger.AvailableNow into a memory sink, and the sink's table is
returned as the result DataFrame.

Because an AvailableNow cycle over a static landing dir is
deterministic, these carry full SQL oracles — DuckDB verifies the
*streaming* engine's output, not a batch stand-in (the batch analogs
live in queries_pipeline.py; tests/test_streaming.py proves
stream≡batch on the same input).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import dround
from ..sources.readers import load_table
from ..streaming import structured as ST
from .catalog import register


def _land_events(spark: SparkSession, sf_dir: str) -> tuple[str, "DataFrame"]:
    """Write events (micros timestamps) into a fresh landing dir."""
    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stream_landing_")
    path = os.path.join(d, "files")
    ev.write.mode("overwrite").parquet(path)
    return path, ev


def _run_to_table(
    spark: SparkSession,
    result: DataFrame,
    mode: str,
    *,
    finalize_watermark: bool = True,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run one AvailableNow cycle into a memory table.

    ``finalize_watermark=False`` skips the trailing NO-DATA micro-batch
    (``noDataMicroBatches.enabled``, restored after the run). That
    batch exists to advance the watermark one last time so append-mode
    AGGREGATIONS flush their final windows and join state gets cleaned
    — for an append-mode stream-stream INNER join it changes no output
    row (matches emit eagerly on arrival) and, on a bounded replay
    cycle whose state dies with the checkpoint anyway, it only re-pays
    a full state-store commit across every partition for zero rows
    (measured: 2.3s of a 7.6s cycle at sf0.1). Queries whose RESULTS
    depend on the final watermark advance (windowed aggregation,
    dropDuplicatesWithinWatermark expiry proofs) must keep the default.

    ``state_partitions`` temporarily overrides shuffle.partitions for
    the cycle: streaming STATE partition count is fixed at the first
    checkpoint, and every micro-batch (including the no-data finalize
    batch) commits EVERY state store — a stream-stream join keeps 4
    stores per partition, so 32 partitions is 128 commits per batch
    for kilobytes of state (measured 8.4s -> 3.9s at sf0.1 with 8).
    Size it to state volume, not CPU count; results are partition-
    independent. Batch-side reads of the memory table are unaffected
    (the conf is restored before returning)."""
    name = "q_" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    pkey = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, "true")
    prev_parts = spark.conf.get(pkey)
    if not finalize_watermark:
        spark.conf.set(key, "false")
    if state_partitions is not None:
        spark.conf.set(pkey, str(state_partitions))
    try:
        ST.run_available_now(result, ckpt, output_mode=mode, query_name=name)
    finally:
        spark.conf.set(key, prev)
        spark.conf.set(pkey, prev_parts)
    return spark.table(name)


_STREAM_TUMBLE_SQL = """
SELECT DATE_TRUNC('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS value_sum
FROM events
GROUP BY 1, 2
"""


@register(
    "stream_tumbling",
    _STREAM_TUMBLE_SQL,
    doc="Structured Streaming tumbling window (AvailableNow file stream → memory sink); oracle checks the streaming output itself",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    stream = ST.read_file_stream(spark, path, ev.schema)
    res = ST.tumbling_counts(stream, width="1 hour", watermark="2 hours")
    out = _run_to_table(spark, res, "complete")
    return out.select(
        F.col("win_start").alias("window_start"),
        "event_type",
        F.col("n_events").alias("n"),
        dround("sum_value", 2).alias("value_sum"),
    )


_STREAM_TOTALS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(COALESCE(value, 0)), 2) AS sum_value
FROM events
GROUP BY user_id
"""


@register(
    "stream_stateful_totals",
    _STREAM_TOTALS_SQL,
    doc="applyInPandasWithState running totals (update mode, multi-micro-batch); final state per user oracle-checked",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    # >1 file → >1 micro-batch → state actually carries across batches
    stream = ST.read_file_stream(spark, path, ev.schema, max_files_per_trigger=1)
    res = ST.running_totals_stateful(stream)
    updates = _run_to_table(spark, res, "update")
    # update-mode memory sink holds every per-batch emission; the final
    # state per user is the one with the largest n_events (monotone)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", dround("sum_value", 2).alias("sum_value"))
    )


_STREAM_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000 THEN 1
              ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts)                           AS sess_start,
       MAX(ts) + INTERVAL 30 MINUTE      AS sess_end,
       COUNT(*)                          AS n_events,
       ROUND(SUM(COALESCE(value, 0)), 2) AS sum_value
FROM sessions
GROUP BY user_id, sid
"""


@register(
    "stream_sessionize",
    _STREAM_SESSION_SQL,
    doc=(
        "Structured Streaming session_window aggregation (gap 30min); "
        "JVM state-store session merging, oracle reproduces the exact "
        "boundary semantics (a gap of exactly 30min starts a NEW "
        "session — Spark merges only strictly-overlapping windows)"
    ),
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    stream = ST.read_file_stream(spark, path, ev.schema)
    res = ST.session_aggregate(stream, gap="30 minutes", watermark="2 hours")
    out = _run_to_table(spark, res, "complete")
    return out.select(
        "user_id",
        "sess_start",
        "sess_end",
        "n_events",
        dround("sum_value", 2).alias("sum_value"),
    )


_STREAM_DEDUP_SQL = """
SELECT event_id, user_id, ts FROM events
"""


@register(
    "stream_dedup",
    _STREAM_DEDUP_SQL,
    doc=(
        "streaming exact dedup: the landing dir holds every event "
        "TWICE (a replayed upstream), dropDuplicatesWithinWatermark on "
        "the key collapses them across micro-batches — state is bounded "
        "by the event-time watermark horizon, the scale property plain "
        "dropDuplicates lacks; oracle = the original distinct rows"
    ),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    path = os.path.join(d, "files")
    ev.write.mode("overwrite").parquet(path)
    ev.write.mode("append").parquet(path)  # the duplicate replay
    stream = ST.read_file_stream(spark, path, ev.schema, max_files_per_trigger=4)
    # watermark far behind max event time: nothing is dropped as late,
    # dedup state spans the whole replayed range
    res = stream.withWatermark("ts", "3650 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    # round-14: state_partitions=8 — every micro-batch (plus the
    # no-data finalize batch) commits EVERY dedup state store, and the
    # state here is kilobytes; width follows state volume, not CPU
    # count (the _run_to_table contract — results are partition-
    # independent, the caller conf is restored). A/B receipt:
    # plans/r14/ab_receipts/stream_dedup.jsonl.
    return _run_to_table(spark, res, "append", state_partitions=8).select(
        "event_id", "user_id", "ts"
    )


_STREAM_PEAKS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(MAX(COALESCE(value, 0)), 2) AS peak
FROM events
GROUP BY user_id
"""


@register(
    "stream_tws_peaks",
    _STREAM_PEAKS_SQL,
    doc=(
        "transformWithStateInPandas (Spark 4 StatefulProcessor) running "
        "per-user peaks: named ValueState on the processor handle, "
        "multi-micro-batch state carry; final state oracle-checked"
    ),
)
def stream_tws_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    stream = ST.read_file_stream(spark, path, ev.schema, max_files_per_trigger=1)
    # TWS needs protobuf in the Python worker; same state semantics on
    # the applyInPandasWithState lane where it's absent (this container)
    peaks = ST.running_peaks_tws if ST.tws_available() else ST.running_peaks_state
    res = peaks(stream)
    updates = _run_to_table(spark, res, "update")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", dround("peak", 2).alias("peak"))
    )


def _gates_oracle() -> str:
    from .queries_curation import _gates_sql

    return _gates_sql()


@register(
    "stream_curation_gates",
    _gates_oracle(),
    doc=(
        "the curation family on a LIVE STREAM: Gopher-style quality "
        "gates applied to a document file-stream (AvailableNow) — the "
        "gates are pure per-row expressions, so the exact same operator "
        "(operators/curation.quality_gates) runs on the stream with no "
        "watermark, no state, and append-mode output; this is how a "
        "100 TB ingest scores docs ON ARRIVAL instead of re-scanning "
        "the corpus later. Oracle checks the streamed output directly"
    ),
)
def stream_curation_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators import curation as CU

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="stream_docs_")
    path = os.path.join(d, "files")
    docs.write.mode("overwrite").parquet(path)
    stream = ST.read_file_stream(spark, path, docs.schema)
    res = CU.quality_gates(stream)
    return _run_to_table(spark, res, "append")


_STREAM_SS_JOIN_SQL = """
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       ROUND(COALESCE(p.value, 0), 2) AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


@register(
    "stream_stream_join",
    _STREAM_SS_JOIN_SQL,
    doc=(
        "stream-stream inner join (click→purchase attribution within "
        "30 min, per user): two watermarked event streams join on key "
        "+ event-time range inside the state store; append mode, every "
        "match emitted exactly once. Runs under a REALISTIC 1-day "
        "watermark (VERDICT r5 item 6) with the trailing no-data batch "
        "ENABLED, so the timed cycle includes what a deployment pays: "
        "the watermark advance + join-state EVICTION commit, not just "
        "ingestion. Correct under replay because the historical landing "
        "dir fits one AvailableNow micro-batch (watermark only advances "
        "between batches; batch 1 starts at epoch, so no row is late "
        "and inner matches emit eagerly) — state expiry under "
        "multi-batch lateness is separately proven via stateOperators "
        "metrics in tests/test_streaming.py. Oracle runs the "
        "equivalent static range join"
    ),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    clicks = (
        ST.read_file_stream(spark, path, ev.schema)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 day")
    )
    purchases = (
        ST.read_file_stream(spark, path, ev.schema)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", "1 day")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    # finalize_watermark=True: with the realistic 1-day watermark the
    # trailing no-data batch actually EVICTS expired join state — the
    # cost a deployment pays per watermark advance — so the benched
    # cycle times it (it changes no output row for an append inner
    # join; matches emit eagerly on arrival). state_partitions=8:
    # 4 state stores per partition x 32 partitions was 128 commits
    # per batch for kilobytes of state — size to state, not cores
    out = _run_to_table(
        spark, joined, "append", finalize_watermark=True, state_partitions=8
    )
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        "click_ts",
        "purchase_ts",
        dround(F.coalesce("value", F.lit(0.0)), 2).alias("purchase_value"),
    )


_STREAM_ENRICH_SQL = """
SELECT c.c_mktsegment AS segment,
       e.event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(COALESCE(e.value, 0)), 2) AS sum_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
"""


@register(
    "stream_enrich_join",
    _STREAM_ENRICH_SQL,
    doc=(
        "stream-static join: the event file-stream enriches against a "
        "broadcast static dimension (customer segment) inside the "
        "micro-batch plan — the standard on-arrival enrichment shape "
        "(at 100 TB/day the dimension broadcasts once per batch, the "
        "stream never shuffles for the join) — then a streaming "
        "aggregation rolls up per (segment, event_type) in complete "
        "mode. Oracle joins/aggregates the same inputs statically"
    ),
)
def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    stream = ST.read_file_stream(spark, path, ev.schema)
    enriched = stream.join(F.broadcast(dim), "user_id")
    res = enriched.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("sum_value"),
    )
    out = _run_to_table(spark, res, "complete")
    return out.select(
        "segment", "event_type", "n_events", dround("sum_value", 2).alias("sum_value")
    )


# ---------------------------------------------------------------------------
# Streaming incremental dedup: continuous ingestion vs a standing corpus
# ---------------------------------------------------------------------------


def _union_all(parts: list) -> DataFrame:
    """unionByName over a non-empty list of same-schema frames."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _inc_minhash_oracle() -> str:
    from .queries_llm import _INC_NEW_MIN, _minhash_sql

    return _minhash_sql(new_min=_INC_NEW_MIN)


@register(
    "stream_incremental_dedup",
    _inc_minhash_oracle(),
    doc=(
        "continuous-ingestion dedup: new documents arrive as a file "
        "stream in multiple micro-batches; each batch computes ONLY its "
        "own MinHash signatures, LSH-probes them against the standing "
        "signature store (old×old never re-paired — O(batch) per "
        "batch), Jaccard-verifies candidates against shingles of the "
        "CANDIDATE docs only, appends verified pairs to the output and "
        "absorbs the batch (docs + signatures) into the store. A pair "
        "is found exactly once — by the batch where its later member "
        "arrives — so the union over batches equals the one-shot "
        "batch answer, and the oracle IS dedup_incremental's SQL. "
        "The hot-bucket guard applies to bucket sizes AS OF each "
        "batch — pairs verified at arrival stand (never retracted), "
        "members arriving after a bucket crosses the cap form no "
        "pairs through it; at a mid-stream crossing the stream is a "
        "strict superset of the one-shot batch guard. That contract "
        "is pinned by test_stream_cap_semantics_as_of_batch (the "
        "fixture corpus itself stays far below the cap, so the "
        "oracle equality here is exact)"
    ),
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D
    from .queries_llm import _INC_NEW_MIN, _JACCARD_MAX_BUCKET

    # Conf sandbox (VERDICT r12 item 4): the absorb loop's micro-batch
    # shuffles run width-8 (volume-not-CPU sizing, set just before the
    # stream starts below), and that width must not leak to concurrent
    # queries on the caller's session — so the whole stream runs in a
    # cloned session (shared SparkContext, isolated SQLConf; every
    # engine conf lives at builder level in session.py, so the clone
    # inherits them all). The caller's conf is never touched — pinned
    # by test_stream_incdedup_width_scoped_to_clone.
    work = spark.newSession()
    docs = load_table(work, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="stream_incdedup_")
    docs_dir = os.path.join(root, "docs")
    sig_dir = os.path.join(root, "sigs")
    out_dir = os.path.join(root, "pairs")
    land_dir = os.path.join(root, "landing")

    # The SOURCE TABLE is the standing document store — production
    # never copies the corpus to dedup it; absorbed batches land as
    # appended files beside it (docs_dir starts empty) and `seen_docs`
    # below is the union of the two, with the standing filter pushed
    # into the source scan. Only the DERIVED signature store must be
    # materialized (the per-batch probe reads it instead of re-hashing
    # the corpus — that is the whole point of a signature store).
    standing = docs.filter(F.col("doc_id") < _INC_NEW_MIN)
    docs.limit(0).coalesce(1).write.parquet(docs_dir)
    sh0 = D.exploded_shingles(standing)
    D.minhash_signatures(sh0, with_counts=True).write.mode("overwrite").parquet(sig_dir)
    sig_schema0 = D.minhash_signatures(sh0.limit(0), with_counts=True).schema

    # In-memory pinned views of the DERIVED stores, one part per batch
    # (VERDICT r10 item 4: the remaining floor was each micro-batch
    # re-reading the signature store AND re-hashing every band — two
    # full store scans per batch). The parquet store stays the durable
    # source of truth (each batch writes its bid-keyed subdirectory —
    # round 14: overwrite subdirs replaced the r12-documented
    # at-least-once appends, so the durable store is retry-idempotent
    # now; a restart re-pins from it); these checkpointed parts are
    # its cache. A checkpoint→read-back job fold was attempted and
    # MEASURED SLOWER this round (see the absorb closure), so the
    # parts remain eager localCheckpoints. At 100 TB the
    # signature/band store is the small derived side (k hashes per
    # document, not the corpus), which is exactly what an absorb loop
    # keeps resident between triggers.
    # Parts are keyed by micro-batch id (ADVICE r11): foreachBatch
    # re-delivers a batch under the SAME _bid after a partial failure,
    # so a retried batch must REPLACE its earlier registration, never
    # append beside it — list-shaped parts would double the batch into
    # the candidate space. Key -1 is the pre-stream store.
    sigs0 = work.read.schema(sig_schema0).parquet(sig_dir).localCheckpoint(eager=True)
    state = {
        "sig_parts": {-1: sigs0},
        "band_parts": {-1: D._band_buckets(sigs0).localCheckpoint(eager=True)},
        "doc_parts": {},  # absorbed batches (the corpus itself stays a source scan)
    }

    # land the new batch as 3 files → 3 micro-batches (range-partitioned
    # so each file is a contiguous id slice; the output SET is
    # batching-invariant, this just makes the replay multi-batch)
    new_docs = docs.filter(F.col("doc_id") >= _INC_NEW_MIN)
    new_docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(land_dir)

    pair_schema = "a long, b long, jaccard double"
    absorb = _incdedup_make_absorb(state, standing, out_dir, docs_dir, sig_dir)

    stream = ST.read_file_stream(
        work, land_dir, docs.schema, max_files_per_trigger=1
    )
    ckpt = os.path.join(root, "ckpt")
    # A micro-batch here is ~1/3 of the new slice — kilobytes of
    # shuffle data across the ~8 per-batch jobs, where 32-way shuffles
    # are pure task-scheduling overhead (the same sizing rule as
    # _run_to_table's state_partitions: width follows data volume, not
    # CPU count; the output set is partition-independent). Set on the
    # CLONED session only, after the full-width corpus setup above —
    # the caller's session keeps its width throughout.
    work.conf.set("spark.sql.shuffle.partitions", "8")
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # bid-keyed subdirs → recursive lookup; the result read runs on the
    # caller's session at the caller's width
    return (
        spark.read.schema(pair_schema)
        .option("recursiveFileLookup", "true")
        .parquet(out_dir)
    )


def _incdedup_make_absorb(
    state: dict, standing: DataFrame, out_dir: str, docs_dir: str, sig_dir: str
):
    """Build stream_incremental_dedup's foreachBatch closure (module
    level, like :func:`_scd2_make_absorb`, so the retry contract is
    directly testable: tests drive it twice with the SAME ``_bid`` and
    assert both the in-memory parts and the read-back pairs converge
    instead of doubling)."""
    from ..operators import dedup as D
    from .queries_llm import _JACCARD_MAX_BUCKET

    def absorb(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        # a retried _bid must not see (or keep) its earlier attempt's
        # parts: drop them up front so the unions below read only
        # other batches' state, then re-register at the end
        for parts in state.values():
            parts.pop(_bid, None)
        # Round 14 (VERDICT r13 item 5): the planned checkpoint→
        # read-back job fold was BUILT AND MEASURED SLOWER — fresh-
        # subprocess interleaved A/B read the folded form 11.34/9.32s
        # vs 10.04/9.15s for the pinned form (receipts in
        # plans/r14/ab_receipts/stream_incremental_dedup.jsonl): later
        # batches re-scan every registered part per consumer, and
        # parquet decode on those re-scans costs more than the one
        # checkpoint job it saved. So the parts stay eager
        # localCheckpoints (memory-resident blocks). What the attempt
        # KEPT is the durable-store idempotency fix: docs/sigs land in
        # bid-keyed overwrite subdirectories (below) instead of plain
        # appends, retiring the at-least-once double-append hazard
        # documented since r12.
        doc_part = batch.localCheckpoint(eager=True)
        # spread=False: the spread repartition is an anti-skew device
        # for corpus-scale explodes; a micro-batch is small, so the
        # extra shuffle is pure per-job overhead here (signature
        # values are identical either way). band_batch stays a lazy
        # projection over the PINNED sig part — banding is a cheap
        # concat, not worth its own checkpoint job per batch.
        sig_batch = D.minhash_signatures(
            D.exploded_shingles(doc_part, spread=False), with_counts=True
        ).localCheckpoint(eager=True)
        band_batch = D._band_buckets(sig_batch)
        all_sigs = _union_all(list(state["sig_parts"].values()) + [sig_batch])
        all_bands = _union_all(list(state["band_parts"].values()) + [band_batch])
        # the candidate-pair frame is tiny (LSH collisions of one batch)
        # but its lineage holds the corpus-band scan, and it feeds
        # THREE consumers below (cand_ids, pair_jaccard's internal
        # candidate-doc restriction, and the final left-semi) — without
        # an eager pin Spark re-runs that scan per consumer (the
        # round-4 broadcast re-execution lesson; round-9 profile showed
        # it as the largest per-batch cost here). The pre-built band
        # store makes that scan memory-resident and hash-free.
        cand = D.lsh_incremental_candidates(
            all_sigs,
            doc_part.select("doc_id"),
            max_bucket=_JACCARD_MAX_BUCKET,
            bands=all_bands,
            new_bands=band_batch,
        ).localCheckpoint(eager=True)
        cand_ids = (
            cand.select(F.col("a").alias("doc_id"))
            .union(cand.select(F.col("b").alias("doc_id")))
            .distinct()
        )
        seen_docs = _union_all([standing] + list(state["doc_parts"].values()))
        cand_docs = (
            seen_docs.unionByName(doc_part)
            .join(F.broadcast(cand_ids), "doc_id", "left_semi")
        )
        # cand_docs is already the candidate restriction (semi-join
        # above), so skip pair_jaccard's internal re-restriction and
        # the spread shuffle — a handful of docs explodes in place
        ver = D.pair_jaccard(
            D.exploded_shingles(cand_docs, spread=False),
            pairs=cand,
            counts=all_sigs.select("doc_id", "n_sh"),
            restrict=False,
        ).filter(F.col("jaccard") >= 0.5)
        # Idempotent per batch (ADVICE r12): out_dir is read back as the
        # query RESULT, so a retried _bid must REPLACE its earlier
        # attempt's pairs, never append beside them — each batch owns a
        # bid-keyed subdirectory written with overwrite. (The docs/sigs
        # stores got the same bid-keyed overwrite treatment above, so
        # the r12 at-least-once append hazard on them is retired too.)
        ver.select("a", "b", dround("jaccard", 6).alias("jaccard")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"bid_{_bid}"))
        # absorb AFTER pairing so the batch never pairs against itself
        # through the store (it pairs against itself via all_sigs):
        # durable bid-keyed overwrite subdirectories (retry-idempotent,
        # round 14 — these reads come from the checkpoint blocks, so
        # each write is one cheap job like the appends it replaces)
        # + the in-memory cache parts
        doc_part.write.mode("overwrite").parquet(
            os.path.join(docs_dir, f"bid_{_bid}")
        )
        sig_batch.write.mode("overwrite").parquet(
            os.path.join(sig_dir, f"bid_{_bid}")
        )
        state["sig_parts"][_bid] = sig_batch
        state["band_parts"][_bid] = band_batch
        state["doc_parts"][_bid] = doc_part

    return absorb


# ---------------------------------------------------------------------------
# Streaming CDC apply: versioned snapshot maintained from a change stream
# ---------------------------------------------------------------------------


def _stream_cdc_oracle() -> str:
    from .queries_pipeline import _CDC_SQL

    return _CDC_SQL


@register(
    "stream_cdc_apply",
    _stream_cdc_oracle(),
    doc=(
        "CDC stream → maintained snapshot: change batches (I/U/D) "
        "arrive as a file stream; each micro-batch reads the CURRENT "
        "snapshot version, applies the batch with the same broadcast "
        "anti-join + append plan as cdc_apply, and writes the NEXT "
        "version directory — the poor-man's versioned table (what "
        "Delta/Iceberg commit protocols productionize; readers always "
        "see a complete version, never a half-written overwrite). The "
        "change feed is keyed disjointly across batches, so the final "
        "version is batch-order independent and hash-matches the "
        "one-shot cdc_apply oracle"
    ),
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = tempfile.mkdtemp(prefix="stream_cdc_")
    land_dir = os.path.join(root, "changes")

    snap0 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    version = {"n": 0}
    snap_dir = lambda v: os.path.join(root, f"snapshot_v{v}")  # noqa: E731
    snap0.write.mode("overwrite").parquet(snap_dir(0))

    # the same deterministic change feed as cdc_apply, landed as a
    # 3-file stream (range-partitioned on k → batches touch disjoint keys)
    changes = (
        snap0.filter(F.col("k") % 10 == 0)
        .select("k", F.lit("U").alias("op"), dround(F.col("price") + 1000, 2).alias("price"), "status")
        .unionByName(
            snap0.filter(F.col("k") % 10 == 1).select(
                "k", F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("price"),
                F.lit(None).cast("string").alias("status"),
            )
        )
        .unionByName(
            snap0.filter(F.col("k") % 10 == 2).select(
                (F.col("k") + 100000000).alias("k"), F.lit("I").alias("op"),
                dround(F.col("k") * 0.01, 2).alias("price"), F.lit("N").alias("status"),
            )
        )
    )
    changes.repartitionByRange(3, "k").write.mode("overwrite").parquet(land_dir)

    snap_schema = snap0.schema

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)
        cur = spark.read.schema(snap_schema).parquet(snap_dir(version["n"]))
        dels = batch.filter(F.col("op") == "D").select("k")
        ups = batch.filter(F.col("op") != "D").select("k", "price", "status")
        nxt = (
            cur.join(F.broadcast(dels), "k", "left_anti")
            .join(F.broadcast(ups.select("k")), "k", "left_anti")
            .unionByName(ups)
        )
        nxt.write.mode("overwrite").parquet(snap_dir(version["n"] + 1))
        version["n"] += 1

    stream = ST.read_file_stream(spark, land_dir, changes.schema, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.schema(snap_schema).parquet(snap_dir(version["n"]))
    return final.select("k", dround("price", 2).alias("price"), "status")


_STREAM_OHLC_SQL = """
WITH keyed AS (
  SELECT event_type,
         date_trunc('day', ts) AS day,
         value,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ordkey
  FROM events WHERE event_type IN ('view', 'purchase')
)
SELECT event_type, day,
       arg_min(value, ordkey) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, ordkey) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM keyed
GROUP BY event_type, day
"""


@register(
    "stream_ohlc",
    _STREAM_OHLC_SQL,
    doc=(
        "streaming OHLC bars: the kline rollup running as a LIVE "
        "Structured Streaming aggregation — daily tumbling window + "
        "watermark, open/close via min_by/max_by over the same "
        "zero-padded (epoch-micros, id) key as the batch events_ohlc. "
        "The streaming state per bar is one (value, key) pair per "
        "side plus the plain extrema — O(bars) state, the same bound "
        "as the batch shuffle; the oracle verifies the streaming "
        "engine's own output (AvailableNow determinism), and the "
        "batch query is its stream≡batch twin"
    ),
)
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    stream = ST.read_file_stream(spark, path, ev.schema).filter(
        F.col("event_type").isin("view", "purchase")
    )
    ordkey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    keyed = stream.withWatermark("ts", "2 hours").select(
        "event_type", "ts", "value", ordkey.alias("ordkey")
    )
    res = keyed.groupBy(
        F.window("ts", "1 day").alias("win"), "event_type"
    ).agg(
        F.min_by("value", "ordkey").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ordkey").alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    out = _run_to_table(spark, res, "complete")
    return out.select(
        "event_type",
        F.col("win.start").cast("date").alias("day"),
        "open",
        "high",
        "low",
        "close",
        "n_ticks",
    )


# ---------------------------------------------------------------------------
# OUTER stream-stream join: unmatched rows emit on watermark expiry
# ---------------------------------------------------------------------------

_SSJ_OUTER_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS purchase_ts, value
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT LEAST((SELECT MAX(click_ts) FROM c),
               (SELECT MAX(purchase_ts) FROM p)) - INTERVAL 1 HOUR AS w
),
matched AS (
  SELECT c.click_id, c.user_id, c.click_ts,
         p.purchase_id, p.purchase_ts,
         ROUND(COALESCE(p.value, 0), 2) AS purchase_value
  FROM c JOIN p
    ON p.p_user_id = c.user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
),
unmatched AS (
  SELECT c.click_id, c.user_id, c.click_ts,
         CAST(NULL AS BIGINT) AS purchase_id,
         CAST(NULL AS TIMESTAMP) AS purchase_ts,
         0.0 AS purchase_value
  FROM c, wm
  WHERE NOT EXISTS (
          SELECT 1 FROM p
          WHERE p.p_user_id = c.user_id
            AND p.purchase_ts >= c.click_ts
            AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
    AND c.click_ts + INTERVAL 30 MINUTE < wm.w
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


@register(
    "stream_stream_join_outer",
    _SSJ_OUTER_SQL,
    doc=(
        "LEFT-OUTER stream-stream join — the capability the inner "
        "join cannot witness: a click with no purchase in its window "
        "emits a NULL-extended row only after the GLOBAL watermark "
        "(min across both inputs, here 1 hour — a real deployment "
        "delay, unlike the inner query's bounded-replay 3650 days) "
        "proves no match can still arrive, i.e. when click_ts + the "
        "30-minute join range falls behind the final watermark. On "
        "the AvailableNow replay the data passes in one micro-batch "
        "(no outer rows yet — the watermark is still at its starting "
        "value while the batch runs) and the trailing no-data batch "
        "advances the watermark once, expiring state and flushing "
        "exactly the provably-unmatched clicks (empirically pinned: "
        "the final click stays in state and is withheld). The oracle "
        "replays both lanes: an inner join for matches plus a "
        "NOT-EXISTS anti lane gated on the same watermark cutoff — "
        "so the EXPIRY rule itself is hash-verified, not just the "
        "matches. State is bounded by the watermark delay + range at "
        "any stream length"
    ),
)
def stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, ev = _land_events(spark, sf_dir)
    clicks = (
        ST.read_file_stream(spark, path, ev.schema)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ST.read_file_stream(spark, path, ev.schema)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    # finalize_watermark=True is REQUIRED here: the outer rows only
    # exist because the trailing no-data batch advances the watermark
    # same 4-stores-per-partition shape as the inner join: size the
    # state partition count to state volume (see _run_to_table)
    out = _run_to_table(spark, joined, "append", state_partitions=8)
    return out.select(
        "click_id",
        "user_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        dround(F.coalesce("value", F.lit(0.0)), 2).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Streaming SCD2 maintenance (wave 64)
# ---------------------------------------------------------------------------

_SCD2_STREAM_SQL = """
WITH upd AS (
  SELECT user_id, ts, event_id, ROUND(value, 2) AS tier
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, tier, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM upd
"""

_SCD2_N_BUCKETS = 16


_SCD2_DIM_SCHEMA = (
    "bkt int, user_id long, tier double, valid_from timestamp, "
    "event_id long, valid_to timestamp, is_current boolean"
)


def _scd2_make_absorb(spark: SparkSession, dim: str):
    """The per-batch SCD2 maintenance closure (shared with the
    order-insensitivity property test, which drives it with scrambled
    batches outside any stream)."""
    from pyspark.sql import Window as W

    def absorb(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.withColumn(
            "bkt", F.pmod(F.col("user_id"), F.lit(_SCD2_N_BUCKETS)).cast("int")
        ).localCheckpoint(eager=True)
        touched = [r.bkt for r in batch.select("bkt").distinct().collect()]
        if os.path.isdir(dim) and any(
            f.endswith(".parquet") or f.startswith("bkt=")
            for f in os.listdir(dim)
        ):
            store = spark.read.schema(_SCD2_DIM_SCHEMA).parquet(dim)
        else:
            store = spark.createDataFrame([], _SCD2_DIM_SCHEMA)
        old = store.filter(F.col("bkt").isin(touched)).select(
            "bkt", "user_id", "tier", F.col("valid_from").alias("ts"), "event_id"
        )
        changes = old.unionByName(
            batch.select("bkt", "user_id", "tier", "ts", "event_id")
        )
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        nxt = F.lead("ts").over(w)
        rebuilt = changes.select(
            "bkt",
            "user_id",
            "tier",
            F.col("ts").alias("valid_from"),
            "event_id",
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        ).localCheckpoint(eager=True)  # materialize BEFORE overwriting
        # the very files `old` reads from
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, "static")
        spark.conf.set(key, "dynamic")
        try:
            rebuilt.write.mode("overwrite").partitionBy("bkt").parquet(dim)
        finally:
            spark.conf.set(key, prev)

    return absorb


@register(
    "stream_scd2_apply",
    _SCD2_STREAM_SQL,
    doc=(
        "streaming SCD2 maintenance — the continuous half of "
        "scd2_dim_history: the change feed arrives in 3 micro-batches "
        "and a foreachBatch sink maintains the dimension as a "
        "BUCKET-PARTITIONED parquet table with dynamic partition "
        "overwrite, i.e. copy-on-write at bucket granularity (the "
        "Delta/Hudi upsert shape). Per batch: touched buckets resolve "
        "from the batch keys (a ≤" f"{_SCD2_N_BUCKETS}" "-row collect), "
        "only those buckets are read back, each touched key's history "
        "is REBUILT from its retained change rows ∪ the batch (every "
        "version row carries its originating change, so rebuild needs "
        "no side log) and exactly those buckets are overwritten — "
        "untouched buckets are never read or written, which is what "
        "bounds per-batch cost by the batch's key locality, not the "
        "corpus. The rebuild makes the maintenance ORDER-INSENSITIVE "
        "(late or out-of-order changes for a key correct its whole "
        "history), so the final table equals the one-shot batch SCD2 "
        "— the oracle IS scd2_dim_history's SQL. The rebuilt frame is "
        "eagerly checkpointed before the overwrite (never read-and-"
        "overwrite the same files lazily)"
    ),
)
def stream_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-14: the stream runs in a cloned session at width 8 — the
    # stream_incremental_dedup conf sandbox (VERDICT r12 item 4): each
    # micro-batch's rebuild window + store read-back shuffle a few
    # thousand rows, where 32-way shuffles are pure task-scheduling
    # overhead; width follows data volume, not CPU count, and the
    # caller's session width is never touched (pinned by
    # test_stream_scd2_width_scoped_to_clone). Fresh-subprocess
    # interleaved A/B receipt: plans/r14/ab_receipts/stream_scd2_apply.jsonl.
    work = spark.newSession()
    ev = load_table(work, sf_dir, "events")
    upd = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", dround(F.col("value"), 2).alias("tier")
    )
    root = tempfile.mkdtemp(prefix="stream_scd2_")
    land = os.path.join(root, "landing")
    dim = os.path.join(root, "dim")
    upd.repartitionByRange(3, "ts", "event_id").write.mode("overwrite").parquet(land)

    absorb = _scd2_make_absorb(work, dim)

    stream = ST.read_file_stream(
        work, land, upd.schema, max_files_per_trigger=1
    )
    ckpt = os.path.join(root, "ckpt")
    work.conf.set("spark.sql.shuffle.partitions", "8")
    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the result read runs on the caller's session at the caller's width
    return spark.read.schema(_SCD2_DIM_SCHEMA).parquet(dim).select(
        "user_id", "tier", "valid_from", "valid_to", "is_current"
    )


# ---------------------------------------------------------------------------
# Watermark late-data audit (wave 72)
# ---------------------------------------------------------------------------

_LATE_CUT = "2024-01-16"
_LATE_DELAY_DAYS = 20

_LATE_SQL = f"""
WITH wm AS (
  SELECT MAX(ts) - INTERVAL {_LATE_DELAY_DAYS} DAY AS w
  FROM events WHERE ts >= TIMESTAMP '{_LATE_CUT}'
),
kept AS (
  SELECT e.* FROM events e, wm
  WHERE e.ts >= TIMESTAMP '{_LATE_CUT}'
     OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.w
)
SELECT date_trunc('hour', ts) AS win_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
       event_type,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM kept
GROUP BY 1, 2, 3
"""


@register(
    "stream_late_data_audit",
    _LATE_SQL,
    doc=(
        "watermark late-data semantics, ORACLED: the on-time half of "
        "the event log streams first (one AvailableNow cycle whose "
        "no-data finalize batch advances the watermark to "
        f"max(ts) − {_LATE_DELAY_DAYS}d), then the old half arrives "
        "LATE in a second cycle sharing the checkpoint — Structured "
        "Streaming drops exactly the rows whose 1h window END ≤ the "
        "standing watermark (verified empirically: 574 windows / 657 "
        "rows at sf0.001, bit-equal to the SQL reconstruction), and "
        "the oracle computes the same survivor set from the raw "
        "table. Update-mode emissions land via foreachBatch into "
        "parquet (the memory sink cannot resume a checkpoint); the "
        "final per-window state is the max-n_events emission "
        "(monotone). This is the T1/T5 drop-forever contract as a "
        "driver-checkable differential query, not just a unit test"
    ),
)
def stream_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cut = F.lit(_LATE_CUT).cast("timestamp")
    on_time = ev.filter(F.col("ts") >= cut)
    late = ev.filter(F.col("ts") < cut)
    root = tempfile.mkdtemp(prefix="stream_late_")
    land = os.path.join(root, "land")
    ckpt = os.path.join(root, "ck")
    out = os.path.join(root, "out")

    def sink(b: DataFrame, _bid: int) -> None:
        if not b.isEmpty():
            b.write.mode("append").parquet(out)

    def run_cycle() -> None:
        res = ST.tumbling_counts(
            ST.read_file_stream(spark, land, ev.schema),
            width="1 hour",
            watermark=f"{_LATE_DELAY_DAYS} days",
        )
        q = (
            res.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    on_time.write.mode("overwrite").parquet(land)
    run_cycle()
    late.write.mode("append").parquet(land)
    run_cycle()
    sch = (
        "win_start timestamp, win_end timestamp, event_type string, "
        "n_events long, sum_value double"
    )
    both = spark.read.schema(sch).parquet(out)
    w = W.partitionBy("win_start", "win_end", "event_type").orderBy(
        F.col("n_events").desc()
    )
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "win_start",
            "win_end",
            "event_type",
            "n_events",
            dround("sum_value", 2).alias("sum_value"),
        )
    )
