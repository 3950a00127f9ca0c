#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints,
as its FINAL stdout line, ONE compact JSON record:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "sf": <float>}

Per-rep detail (every rep's time, in run order — so a reader can
separate noise from regression) goes to STDERR, never the final line:
the driver captures only the TAIL of stdout and parses the last line,
and round 4 proved that folding `detail` into the record pushes the
line's front (metric/value/queries) past the capture window —
BENCH_r04.json recorded `parsed: null`. Last-and-short wins.

Headline set: one representative per operator family (scan+agg, joins,
windows, sessionization, as-of, incremental, dedup, similarity, text,
JSON) — the 100 TB-relevant shapes, timed end-to-end including the
action, excluding session startup.

The action is a FULL-evaluation hash aggregate (xxhash64 over every
output column → count+max), not .count(): count() lets Catalyst prune
computed columns, so map-only queries measured only their scan
(round-5 discovery — see SCALE.md "let-binding lesson"). Round-over-
round note: map-only queries (text_metrics, curation_pii_redact,
json_variant, multimodal_*) step UP versus the r1-r4 records at the
point of this change — that is the previously-unmeasured work
becoming visible, not a regression.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from a_share_data_pipeline_spark.plans import registry  # noqa: E402
from a_share_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_pricing_summary",
    "agg_stats",
    "agg_grouping_sets",
    "join_top_orders",
    "join_regional_revenue",
    "join_salted",
    "join_range",
    "udf_pandas_scalar",
    "canonical_assembly",
    "window_running",
    "window_rank",
    "bucketed_ma",
    "layout_zorder",
    "events_tumbling",
    "events_sessionize",
    "asof_join",
    "incremental_delta",
    "json_extract",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_semantic",
    "dedup_substring",
    "dedup_components",
    "kmeans_embeddings",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "dedup_incremental",
    "text_metrics",
    "text_token_counts",
    "text_lm_quality",
    "sim_random_projection",
    "sql_in_subquery",
    "sql_scalar_subquery",
    "text_tfidf",
    "curation_repetition",
    "curation_quality_gates",
    "curation_decontaminate",
    "curation_pack_sequences",
    "curation_pii_redact",
    "curation_line_dedup",
    "sample_mixture",
    "profile_expectations",
    "events_funnel",
    "events_retention",
    "scd2_dim_history",
    "cdc_apply",
    "join_interval_overlap",
    "join_bloom_prune",
    "text_bm25",
    "graph_pagerank",
    "events_ohlc",
    "text_winnow_fingerprint",
    "dedup_winnow_pairs",
    "profile_skew_report",
    "sql_recursive_cte",
    "json_variant",
    "events_ema",
    "events_macd",
    "agg_quantile_sketch",
    "events_kdj",
    # round-6 analytics wave: the iterative/join-heavy new families
    "graph_label_propagation",
    "graph_bfs_hops",
    "dedup_containment",
    "events_attribution",
    "events_multires_rollup",
    "dedup_jaccard_prefix",
    "profile_distribution_drift",
    "incremental_join_delta",
    # round-6 waves 5/6: frontier, iterative-weighted, resampling,
    # reconstruction — the families whose cost shape is new
    "skyline_pareto",
    "graph_sssp_weighted",
    "stats_bootstrap_ci",
    "cdc_time_travel",
    "window_rolling_median",
    # waves 7-9: per-occurrence funnel, degeneracy peeling, and the
    # exhaustive-truth quality harness (the costliest new shapes)
    "events_window_funnel",
    "graph_kcore",
    "dedup_lsh_quality",
    # the streaming lane: real AvailableNow file-stream cycles (landing
    # write + micro-batch run + memory sink), timed end-to-end so the
    # Structured Streaming machinery has a tracked cost per round
    "stream_curation_gates",
    "stream_stream_join",
    # waves 18-24: the costliest new shapes — the n·d² Gram pass +
    # integer power iteration, the ×100 permutation fan-out, the
    # user-key pair expansion (CF), and the 9-cell spatial probe join
    "feature_pca_power",
    "stats_permutation_test",
    "rec_user_topn",
    "geo_grid_knn",
    # waves 26-33: the positional-explode CDC chunker and the
    # two-CC-pass incremental graph maintenance
    "dedup_content_chunking",
    "graph_cc_incremental",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    reg = registry()

    # warmup: spin executors + codegen + parquet reader infra once,
    # outside timing (one-time Hadoop/parquet class-init otherwise
    # lands on whichever query runs first)
    spark.range(1000).selectExpr("sum(id)").collect()
    from a_share_data_pipeline_spark.sources.readers import load_table

    load_table(spark, sf_dir, "lineitem").limit(1).count()

    missing = [n for n in HEADLINE if n not in reg]
    if missing:  # loud on stderr, never a crashed bench record
        print(f"bench: skipping unknown queries {missing}", file=sys.stderr)

    def isolate(full: bool = True) -> None:
        # measure plans, not session residue: drop cached blocks left by
        # a previous entry (CacheManager), release Python-side refs so
        # the ContextCleaner can free localCheckpoint RDD blocks, and —
        # once per QUERY, not per rep — nudge the JVM GC so its
        # reference queue drains. (A System.gc() per rep measured as
        # the dominant bench overhead: ~1.5s x ~230 reps was more wall
        # time than the queries themselves.)
        spark.catalog.clearCache()
        gc.collect()
        if full:
            spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in HEADLINE:
        if name in missing:
            continue
        fn = reg[name].fn
        # adaptive best-of-N (2..4): stop once the two fastest reps
        # agree within 10% AND the overall rep spread is within 20% —
        # stable queries pay 2 reps; a rep hit by one-off JIT/IO/
        # scheduler noise, or a wide-spread iterative query (VERDICT
        # r4 item 7: dedup_components spread exceeded 20%), triggers
        # up to 2 more instead of polluting the record. The cap stays
        # at 4: JIT warm-up keeps lowering times through rep 4 for
        # many queries (measured), so a lower cap would inflate the
        # recorded minima.
        times: list[float] = []
        isolate(full=True)
        while len(times) < 4:
            if times:
                isolate(full=False)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # force FULL evaluation: .count() lets Catalyst prune every
            # computed column, so a map-only query's actual work was
            # never measured (discovered round 5: an O(m²)
            # expression-inlining bug costing 24 ms/doc was invisible
            # behind a 0.24 s count). xxhash64 over all columns keeps
            # every expression referenced in ONE pass; overhead is one
            # hash per row, uniform across queries.
            from pyspark.sql import functions as _F

            df.select(
                _F.xxhash64(*[_F.col(c) for c in df.columns]).alias("__h")
            ).agg(_F.count("__h"), _F.max("__h")).collect()
            times.append(time.perf_counter() - t0)
            if len(times) >= 2:
                lo, lo2 = sorted(times)[:2]
                if lo2 <= lo * 1.10 and max(times) <= lo * 1.20:
                    break
        timings[name] = round(min(times), 3)
        # every rep, in run order — so a record reader can separate
        # noise from regression (VERDICT r3: min() alone cannot)
        detail[name] = {"reps": len(times), "times": [round(t, 3) for t in times]}

    total = round(sum(timings.values()), 3)
    # per-rep detail on stderr: out of the driver's stdout-tail parse
    # path entirely, still in the round log for human readers
    print(json.dumps({"bench_detail": detail}), file=sys.stderr)
    record = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        # frozen methodology label (VERDICT r5 item 2): xxhash64 over
        # ALL output columns forces full evaluation; one System.gc()
        # per query (not per rep) isolates entries. A record whose
        # "method" differs from its predecessor's is NOT
        # round-over-round comparable; never change evaluation and
        # isolation in the same round.
        "method": "xxhash64-full-gc1",
        "queries": timings,
        "sf": sf,
    }
    if missing:
        record["skipped"] = missing
    print(json.dumps(record))


if __name__ == "__main__":
    main()
