"""Scale-technique tests: salting, bucketed co-located joins, TTL dim
cache — the techniques that matter at 100 TB, proven on small data by
asserting RESULT equivalence and PLAN shape."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from a_share_data_pipeline_spark.operators.skew import salted_join
from a_share_data_pipeline_spark.sources.dim_cache import DimCache
from a_share_data_pipeline_spark.sources.readers import load_table

from test_plan_quality import executed_plan_str, plan_str

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            customer,
            keys=["c_custkey"],
            salt_buckets=8,
        )
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev"))
    )
    got = {(r.c_nationkey, r.n, round(r.rev, 2)) for r in salted.collect()}
    want = {(r.c_nationkey, r.n, round(r.rev, 2)) for r in plain.collect()}
    assert got == want


def test_salted_join_left_preserves_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], "k int, va string")
    b = spark.createDataFrame([(1, "p"), (2, "q")], "k int, vb string")
    out = salted_join(a, b, keys=["k"], how="left", salt_buckets=4).collect()
    assert len(out) == 3
    assert {r.k: r.vb for r in out} == {1: "p", 2: "q", 99: None}


def test_salted_join_shuffles_on_salt(spark):
    """The exchange must partition on (key, salt), not key alone —
    that's the entire point."""
    a = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "c_custkey")
    b = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    with_salt = salted_join(a, b, keys=["c_custkey"], salt_buckets=8)
    # force a shuffle join so the partitioning is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_str(with_salt, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "__salt" in p and "hashpartitioning(c_custkey" in p, p
    assert "__salt" in p.split("hashpartitioning(c_custkey", 1)[1][:80], p


def test_bucketed_join_has_no_exchange(spark):
    """Bucketed tables co-locate join keys at WRITE time: two tables
    bucketed by the same key join with zero Exchange — at 100 TB this
    removes the dominant shuffle from every recurring join on the
    canonical key. (Managed tables land in the default warehouse dir;
    dropped in the finally block.)"""
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(
        "orders_b"
    )
    customer.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(
        "customer_b"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        p = executed_plan_str(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
    assert "SortMergeJoin" in p, p
    assert "Exchange" not in p, p  # co-located: no shuffle at read time


def test_dim_cache_ttl(spark):
    calls = {"n": 0}
    clock = {"t": 0.0}

    def loader():
        calls["n"] += 1
        return spark.range(5).toDF("id")

    cache = DimCache(ttl_s=100.0, clock=lambda: clock["t"])
    d1 = cache.get("dim", loader)
    d2 = cache.get("dim", loader)
    assert calls["n"] == 1 and d1 is d2  # served from snapshot
    clock["t"] = 50.0
    cache.get("dim", loader)
    assert calls["n"] == 1  # still fresh
    clock["t"] = 150.0
    d3 = cache.get("dim", loader)
    assert calls["n"] == 2 and d3 is not d1  # TTL expired → reloaded
    cache.invalidate()
    cache.get("dim", loader)
    assert calls["n"] == 3


def test_native_sink_partition_pruning(spark, tmp_path):
    """write_native partitions by date; a date-equality filter on the
    read side must prune to ONE partition directory (PartitionFilters
    in the scan, not a post-scan filter) — the mechanism that makes the
    incremental path O(delta) instead of O(table) at 100 TB."""
    import os

    from a_share_data_pipeline_spark.sources.sinks import write_native

    ev = load_table(spark, SF, "events").withColumn("date", F.to_date("ts"))
    out = str(tmp_path / "events_table")
    write_native(ev, out, mode="overwrite", partition_by=("date",))
    parts = [p for p in os.listdir(out) if p.startswith("date=")]
    assert len(parts) > 1

    one_day = parts[0].split("=", 1)[1]
    q = spark.read.parquet(out).filter(F.col("date") == one_day)
    p = plan_str(q)
    assert "PartitionFilters" in p, p
    pf_line = next(ln for ln in p.splitlines() if "PartitionFilters" in ln)
    assert "date" in pf_line and "isnotnull" in pf_line, pf_line
    # the pruned scan must not enumerate all partition dirs
    n = q.count()
    full = spark.read.parquet(out).filter(F.to_date(F.col("ts")) == one_day).count()
    assert n == full and n > 0


def test_write_native_cluster_by_sorts_row_groups(spark, tmp_path):
    """cluster_by must sort rows within each written file (no extra
    shuffle) so parquet min/max stats prune row groups on the
    clustered column."""
    import pyarrow.parquet as pq

    from a_share_data_pipeline_spark.sources.sinks import write_native

    df = spark.range(0, 10000).select(
        (F.col("id") % 7).cast("string").alias("date"),
        F.concat(F.lit("c"), (F.col("id") * 997 % 1000)).alias("code"),
        F.col("id").cast("double").alias("v"),
    )
    out = str(tmp_path / "clustered")
    write_native(df, out, partition_by=("date",), cluster_by=("code",))
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert files
    for path in files[:4]:
        codes = pq.read_table(path, columns=["code"]).column("code").to_pylist()
        assert codes == sorted(codes), path


def test_hot_shingle_bucket_cap_bounds_pair_expansion(spark, caplog):
    """A stop-shingle shared by every doc must NOT expand to O(N²)
    pairs when the cap is set: the hot bucket is dropped (and logged)
    before expansion, while small buckets still pair up."""
    import logging

    from a_share_data_pipeline_spark.operators.dedup import _bucket_pairs

    n = 60
    rows = [(i, "HOT") for i in range(n)]  # one bucket with all 60 ids
    rows += [(1, "small"), (2, "small")]  # plus a legitimate 2-id bucket
    df = spark.createDataFrame(rows, "doc_id long, bucket string")

    uncapped = _bucket_pairs(df, "doc_id").count()
    assert uncapped == n * (n - 1) // 2 + 1

    with caplog.at_level(logging.WARNING):
        capped = _bucket_pairs(df, "doc_id", max_bucket=10)
        got = {(r.a, r.b) for r in capped.collect()}
    assert got == {(1, 2)}  # hot bucket gone, small bucket survives
    assert any("hot bucket" in r.message for r in caplog.records)


def test_pair_jaccard_cap_drops_stop_shingle_intersections(spark):
    """With the cap, intersections through the stop-shingle are not
    counted — two docs overlapping ONLY via the hot shingle produce no
    pair, while genuinely near-dup docs still do."""
    from a_share_data_pipeline_spark.operators import dedup as D

    # 12 docs all share shingle 'stop'; docs 0/1 also share 3 real shingles
    rows = [(i, "stop") for i in range(12)]
    rows += [(0, f"real{k}") for k in range(3)] + [(1, f"real{k}") for k in range(3)]
    shingled = spark.createDataFrame(rows, "doc_id long, shingle string")
    out = D.pair_jaccard(shingled, min_overlap=3, max_bucket=10).collect()
    assert {(r.a, r.b) for r in out} == {(0, 1)}
    [r] = out
    assert abs(r.jaccard - 3 / 5) < 1e-9  # 3 shared real / (4 + 4 - 3)


def test_lsh_band_candidates_cap_drops_hot_band_bucket(spark, caplog):
    """Mass-duplicated boilerplate puts N docs in ONE band bucket; with
    the cap their N(N-1)/2 candidate pairs must not materialize, while
    an ordinary 2-doc bucket still pairs up."""
    import logging

    from a_share_data_pipeline_spark.operators import dedup as D

    # 30 docs with IDENTICAL shingle sets → identical signatures → one
    # hot bucket per band; 2 other docs share their own distinct set
    rows = [(i, f"x{k}") for i in range(30) for k in range(3)]
    rows += [(d, f"y{k}") for d in (100, 101) for k in range(3)]
    shingled = spark.createDataFrame(rows, "doc_id long, shingle string")
    sig = D.minhash_signatures(shingled)

    uncapped = D.lsh_band_candidates(sig).count()
    assert uncapped == 30 * 29 // 2 + 1

    with caplog.at_level(logging.WARNING):
        capped = {
            (r.a, r.b)
            for r in D.lsh_band_candidates(sig, max_bucket=10).collect()
        }
    assert capped == {(100, 101)}
    assert any("hot bucket" in r.message for r in caplog.records)


def test_pair_jaccard_restrict_false_equals_caller_restriction(spark):
    """`restrict=False` asserts the caller already semi-joined the
    shingle set to the candidate docs; on such an input it must return
    exactly what the internal restriction would — the per-micro-batch
    job-cut in stream_incremental_dedup rides on this equivalence."""
    from a_share_data_pipeline_spark.operators import dedup as D

    rows = [(i, f"s{j}") for i in range(8) for j in range(i, i + 4)]
    shingled = spark.createDataFrame(rows, "doc_id long, shingle string")
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "a long, b long")
    cand_docs = spark.createDataFrame([(0,), (1,), (2,), (3,)], "doc_id long")
    pre = shingled.join(cand_docs, "doc_id", "left_semi")

    full = {(r.a, r.b, round(r.jaccard, 9))
            for r in D.pair_jaccard(shingled, pairs=pairs).collect()}
    fast = {(r.a, r.b, round(r.jaccard, 9))
            for r in D.pair_jaccard(pre, pairs=pairs, restrict=False).collect()}
    assert full == fast and full  # non-vacuous


def test_lsh_incremental_candidates_cap_filters_before_bucket_join(spark, caplog):
    """The incremental path forms pairs via a bucket JOIN, so its guard
    is a pre-join bucket-size filter: a new doc landing in a hot bucket
    must not fan out against every standing-corpus member."""
    import logging

    from a_share_data_pipeline_spark.operators import dedup as D

    rows = [(i, f"x{k}") for i in range(30) for k in range(3)]
    rows += [(d, f"y{k}") for d in (100, 101) for k in range(3)]
    shingled = spark.createDataFrame(rows, "doc_id long, shingle string")
    sig = D.minhash_signatures(shingled)
    new_ids = spark.createDataFrame([(29,), (101,)], "doc_id long")

    uncapped = D.lsh_incremental_candidates(sig, new_ids).count()
    assert uncapped == 29 + 1  # doc 29 × standing 0..28, plus (100, 101)

    with caplog.at_level(logging.WARNING):
        capped = {
            (r.a, r.b)
            for r in D.lsh_incremental_candidates(
                sig, new_ids, max_bucket=10
            ).collect()
        }
    assert capped == {(100, 101)}
    assert any("hot band bucket" in r.message for r in caplog.records)


def test_lsh_incremental_prebuilt_bands_identical(spark):
    """The prebuilt-bands fast path (VERDICT r10 item 4:
    stream_incremental_dedup keeps the band store pinned across
    micro-batches instead of re-hashing it per batch) must produce
    byte-identical candidate pairs to the self-computed path — with
    and without the hot-bucket guard."""
    from a_share_data_pipeline_spark.operators import dedup as D

    rows = [(i, f"x{k}") for i in range(30) for k in range(3)]
    rows += [(d, f"y{k}") for d in (100, 101) for k in range(3)]
    shingled = spark.createDataFrame(rows, "doc_id long, shingle string")
    sig = D.minhash_signatures(shingled)
    bands = D._band_buckets(sig).localCheckpoint(eager=True)
    new_ids = spark.createDataFrame([(29,), (101,)], "doc_id long")

    for cap in (None, 10):
        want = {
            (r.a, r.b)
            for r in D.lsh_incremental_candidates(
                sig, new_ids, max_bucket=cap
            ).collect()
        }
        got = {
            (r.a, r.b)
            for r in D.lsh_incremental_candidates(
                sig, new_ids, max_bucket=cap, bands=bands
            ).collect()
        }
        # and with the probe side pre-restricted by the caller
        nb = bands.join(F.broadcast(new_ids), "doc_id", "left_semi")
        got2 = {
            (r.a, r.b)
            for r in D.lsh_incremental_candidates(
                sig, new_ids, max_bucket=cap, bands=bands, new_bands=nb
            ).collect()
        }
        assert want == got == got2 and want, cap


def test_lsh_incremental_new_bands_without_bands_rejected(spark):
    """ADVICE r11: new_bands is the new-ids restriction OF the prebuilt
    bands table — passing it alone is an invalid combination that the
    self-computed branch used to silently discard. It must fail loudly,
    not run the slow path while the caller believes the fast path is
    live."""
    import pytest

    from a_share_data_pipeline_spark.operators import dedup as D

    rows = [(i, f"x{k}") for i in range(4) for k in range(3)]
    shingled = spark.createDataFrame(rows, "doc_id long, shingle string")
    sig = D.minhash_signatures(shingled)
    new_ids = spark.createDataFrame([(3,)], "doc_id long")
    nb = D._band_buckets(sig).join(
        F.broadcast(new_ids), "doc_id", "left_semi"
    )
    with pytest.raises(ValueError, match="new_bands was passed without"):
        D.lsh_incremental_candidates(sig, new_ids, new_bands=nb)


def test_salted_join_wins_where_aqe_skew_split_cannot_apply(spark):
    """WHY skew.py exists when AQE has skew-join splitting: AQE splits
    a skewed shuffle partition only when nothing downstream requires
    the join's hash-partitioning. A groupBy on the JOIN KEY right after
    the join pins that distribution (Exchange reuse), so AQE bails and
    the hot key still lands in one reducer. The salted join spreads the
    hot key over (key, salt) reducers AND the downstream agg stays
    correct — partials reduce per (key, salt), then one tiny final
    shuffle on key. Pinned here as executed-plan facts."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 50000).select(
            F.lit(1).cast("long").alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(0, 1000).select(
                (F.col("id") % 100 + 2).cast("long").alias("k"), F.col("id")
            )
        )
        small = spark.createDataFrame([(i, f"d{i}") for i in range(1, 102)], "k long, dk string")

        join_only = big.join(small, "k")
        join_only.collect()
        assert "skew=true" in executed_plan_str(join_only)  # AQE handles this one

        join_agg = big.join(small, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        join_agg.collect()
        # the agg's required distribution pins the partitioning: NO split
        assert "skew=true" not in executed_plan_str(join_agg)

        salted = (
            salted_join(big, small, keys=["k"], salt_buckets=8)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = plan_str(salted, "simple")
        # the join shuffle hashes on (k, __salt): the hot key is spread
        # (the FINAL agg exchange on k alone comes first in the printed
        # tree — look for the deeper join exchange)
        import re

        assert re.search(r"hashpartitioning\(k#\d+L?, __salt", p), p
        got = {(r.k, r.n) for r in salted.collect()}
        want = {(r.k, r.n) for r in join_agg.collect()}
        assert got == want
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_write_tightens_stats_on_both_columns(spark, tmp_path):
    """Z-clustered files must have NARROW min/max spans on BOTH
    participating columns (any contiguous Morton range is a small
    hyper-rectangle), while hash-distributed files span nearly the full
    range of each — the property that lets parquet stats skip files/
    row-groups whichever dimension the predicate hits."""
    import pyarrow.parquet as pq

    from a_share_data_pipeline_spark.operators.layout import zorder_write

    orders = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice")

    def file_spans(root):
        spans = {"o_custkey": [], "o_totalprice": []}
        for dp, _, fs in os.walk(root):
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                md = pq.read_metadata(os.path.join(dp, f))
                for col in spans:
                    lo, hi = None, None
                    for rg in range(md.num_row_groups):
                        for ci in range(md.num_columns):
                            c = md.row_group(rg).column(ci)
                            if c.path_in_schema == col and c.statistics:
                                s = c.statistics
                                lo = s.min if lo is None else min(lo, s.min)
                                hi = s.max if hi is None else max(hi, s.max)
                    if lo is not None:
                        spans[col].append(hi - lo)
        return spans

    z_out = str(tmp_path / "zordered")
    zorder_write(orders, z_out, ["o_custkey", "o_totalprice"], bits=8, n_files=16)
    base_out = str(tmp_path / "hashed")
    orders.repartition(16).write.parquet(base_out)

    rows = orders.agg(
        F.max("o_custkey") - F.min("o_custkey"),
        F.max("o_totalprice") - F.min("o_totalprice"),
    ).first()
    global_span = {"o_custkey": rows[0], "o_totalprice": rows[1]}

    z, h = file_spans(z_out), file_spans(base_out)
    for col in ("o_custkey", "o_totalprice"):
        z_avg = sum(z[col]) / len(z[col]) / global_span[col]
        h_avg = sum(h[col]) / len(h[col]) / global_span[col]
        # hash files span ~the whole range; z files a fraction of it
        assert h_avg > 0.8, (col, h_avg)
        assert z_avg < 0.55, (col, z_avg)
        assert z_avg < h_avg / 1.8, (col, z_avg, h_avg)


def test_ann_paths_recall_against_brute_force(spark):
    """The three ANN paths are approximations — their oracles prove the
    IMPLEMENTATION is exact, this proves the RETRIEVAL is useful:
    top-3 overlap vs the brute-force ranking on the fixture embeddings
    must clear a floor for every path."""
    from a_share_data_pipeline_spark.operators import similarity as SIM

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", SIM.as_double_vec("embedding", "v")
    )
    vectors = emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("ce")
    )

    def topk_sets(df, score_col, k=3):
        out: dict[int, set] = {}
        for r in df.collect():
            if r.rnk <= k:
                out.setdefault(r.q_id, set()).add(r.c_id)
        return out

    exact = topk_sets(SIM.brute_force_topk(vectors, queries, k=3), "cos")

    def recall(approx):
        hits = total = 0
        for q, want in exact.items():
            got = approx.get(q, set())
            hits += len(got & want)
            total += len(want)
        return hits / total

    lsh = topk_sets(SIM.lsh_topk(vectors, queries, k=3), "cos")
    ivf = topk_sets(SIM.ivf_topk(vectors, queries, centroids, k=3, nprobe=2), "cos")
    pq = topk_sets(SIM.pq_adc_topk(vectors, queries, k=3, m=8, n_codes=16, d=64), "adist")
    ivfpq = topk_sets(SIM.ivf_pq_topk(vectors, queries, centroids, k=3, nprobe=2), "adist")

    # floors chosen from the fixture's measured behavior (lsh 0.375,
    # ivf@nprobe2 0.542, pq 0.125, ivf-pq 0.125) with slack: the point
    # is a regression guard — a bucketing/encoding bug drops recall to
    # ~0. PQ's untrained first-k codebooks trade recall for
    # deterministic oracle reproducibility; a trained codebook plugs
    # into pq_codebooks' contract unchanged. IVF-PQ compounds PQ's
    # distortion with the probed-cell restriction, hence the lowest bar.
    assert recall(lsh) >= 0.25, recall(lsh)
    assert recall(ivf) >= 0.40, recall(ivf)
    assert recall(pq) >= 0.10, recall(pq)
    assert recall(ivfpq) >= 0.08, recall(ivfpq)


def test_banded_lsh_pairs_catch_near_dups_without_all_pairs(spark):
    """The banded sign-LSH candidate generator (dedup_embedding_cosine's
    scale path) must surface genuinely near-identical vectors while
    producing far fewer candidates than the all-pairs product it
    replaces."""
    import hashlib

    from a_share_data_pipeline_spark.operators import similarity as SIM

    dim = 64

    def vec(seed: int) -> list[float]:
        # md5-derived components: independent across seeds (an LCG fixture
        # here yields mutually-correlated vectors that legitimately share
        # sign buckets, which tests the fixture, not the operator)
        return [
            int(hashlib.md5(f"{seed}-{i}".encode()).hexdigest()[:8], 16)
            / float(16**8)
            * 2.0
            - 1.0
            for i in range(dim)
        ]

    rows = [(i, vec(i)) for i in range(40)]
    base = vec(0)
    rows += [(100, [x + 0.01 for x in base]), (101, [x + 0.02 for x in base])]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    pairs = {(r.a, r.b) for r in SIM.banded_lsh_pairs(emb).collect()}
    assert {(0, 100), (0, 101), (100, 101)} <= pairs
    assert len(pairs) < 42 * 41 // 2 / 4  # nowhere near all-pairs


def test_embedding_neardup_queries_are_not_vacuous(spark):
    """VERDICT r3 item 2: the embedding near-dup rows must actually
    exercise the cosine math. The fixture augmentation plants one
    near-duplicate per STRIDE-th vector; both dedup_embedding_cosine
    (banded LSH path) and dedup_semantic (cluster-scoped path) must
    recover every planted (src, src+offset) pair — if a testdata
    regeneration or an augmentation edit ever silences these queries
    back to 0 rows, this fails loudly instead of hash-matching 0≡0."""
    from a_share_data_pipeline_spark.plans.catalog import registry
    from a_share_data_pipeline_spark.plans.queries_llm import (
        _EMB_AUG_OFFSET,
        _EMB_AUG_STRIDE,
    )

    n_vec = load_table(spark, SF, "embeddings").count()
    # the augmented ids live at src + OFFSET: a real vec_id at or above
    # the offset would collide and silently corrupt the fixture in BOTH
    # engines at once (ADVICE r4) — fail loudly here instead
    max_id = load_table(spark, SF, "embeddings").selectExpr("max(vec_id) AS m").first().m
    assert max_id < _EMB_AUG_OFFSET, (
        f"embeddings.vec_id reaches {max_id} >= _EMB_AUG_OFFSET "
        f"({_EMB_AUG_OFFSET}); raise the offset before trusting the fixture"
    )
    planted = {
        (a, a + _EMB_AUG_OFFSET) for a in range(0, n_vec, _EMB_AUG_STRIDE)
    }
    for name in ("dedup_embedding_cosine", "dedup_semantic"):
        rows = registry()[name].fn(spark, SF).collect()
        got = {(r.a, r.b) for r in rows}
        assert planted <= got, f"{name} missed planted pairs: {planted - got}"
        assert all(r.cos >= 0.95 for r in rows), name
    # same contract for the substring stats: every doc carrying the
    # planted license block must report >= 1 duplicated window
    sub = registry()["dedup_substring"].fn(spark, SF).collect()
    assert all(r.n_dup >= 1 for r in sub if r.doc_id % 5 == 0)
    assert any(r.n_dup == 0 for r in sub)  # and clean docs stay clean


def test_substring_removal_matches_python_reference(spark):
    """VERDICT r4 item 4: remove_dup_substrings must actually REWRITE.
    Checked against an independent pure-Python reference of the whole
    semantics (disjoint 16-token windows, full-windows-only hotness by
    distinct-doc count, in-order reassembly): every augmentation carrier
    loses the planted license window, docs that are natural corpus
    duplicates lose their shared full windows, and untouched docs
    reassemble byte-identical."""
    from collections import defaultdict

    from a_share_data_pipeline_spark.plans.catalog import registry
    from a_share_data_pipeline_spark.plans.queries_llm import _SUBSTR_BOILER

    docs = {r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()}

    def augmented(i: int, t: str) -> str:
        if i % 5 != 0:
            return t
        k = (16 - len(t.split(" ")) % 16) % 16
        return t + " " + "pad " * k + _SUBSTR_BOILER

    wins: dict[int, list[list[str]]] = {}
    holders: dict[str, set[int]] = defaultdict(set)
    for i, t in docs.items():
        toks = augmented(i, t).split(" ")
        ws = [toks[j : j + 16] for j in range(0, len(toks), 16)]
        wins[i] = ws
        for w in ws:
            if len(w) == 16:  # only full windows are removal candidates
                holders[" ".join(w)].add(i)
    expected = {}
    for i, ws in wins.items():
        kept = [w for w in ws if not (len(w) == 16 and len(holders[" ".join(w)]) >= 2)]
        expected[i] = (len(ws), len(ws) - len(kept), " ".join(" ".join(w) for w in kept))

    out = registry()["dedup_substring_removal"].fn(spark, SF).collect()
    assert len(out) == len(docs)
    for r in out:
        assert (r.n_windows, r.n_removed, r.text_clean) == expected[r.doc_id], r.doc_id
    # the fixture actually exercises both directions:
    assert all(expected[i][1] >= 1 for i in docs if i % 5 == 0)  # carriers shrink
    assert any(  # some clean doc reassembles byte-identical
        expected[i][1] == 0 and expected[i][2] == docs[i] for i in docs if i % 5 != 0
    )


def test_compact_files_bounds_file_count(spark, tmp_path):
    """compact_files must collapse a fragmented table to the computed
    ceil(bytes/target) file count (±1 for range-partition boundaries),
    lose no rows, and with sort_col produce non-overlapping per-file
    ranges (compaction + re-clustering in one pass)."""
    import os

    from a_share_data_pipeline_spark.operators.layout import compact_files

    ev = load_table(spark, SF, "events").select("event_id", "ts", "user_id")
    frag = str(tmp_path / "frag")
    ev.repartition(64).write.parquet(frag)
    fragged = spark.read.parquet(frag)
    n_in = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_in == 64
    dst = str(tmp_path / "compacted")
    n = compact_files(fragged, dst, target_bytes=1 << 20, sort_col="ts")
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) <= max(n, 1) + 1 and len(files) < n_in
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    # per-file ts ranges must not overlap (range partition + sort)
    spans = []
    for f in files:
        mm = spark.read.parquet(os.path.join(dst, f)).agg(
            F.min("ts"), F.max("ts")
        ).first()
        spans.append((mm[0], mm[1]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_compact_files_output_sizes_near_target(spark, tmp_path):
    """VERDICT r4 item 5: the sizing estimate must translate into real
    on-disk file sizes — a wrong estimate would silently produce one
    giant file or a dust pile of tiny ones while still passing the
    count/range/losslessness tests. Every compacted file must land
    within ~2x of target_bytes at fixture scale (parquet per-file
    overhead and sorted-data compression drift rule out exactness)."""
    import os

    from a_share_data_pipeline_spark.operators.layout import compact_files

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    frag = str(tmp_path / "frag")
    li.repartition(32).write.parquet(frag)
    fragged = spark.read.parquet(frag)
    target = 256 << 10
    dst = str(tmp_path / "compacted")
    n = compact_files(fragged, dst, target_bytes=target, sort_col="l_orderkey")
    sizes = sorted(
        os.path.getsize(os.path.join(dst, f))
        for f in os.listdir(dst)
        if f.endswith(".parquet")
    )
    assert abs(len(sizes) - n) <= 1
    assert max(sizes) <= 2 * target  # no single giant file
    assert max(sizes) >= target // 4  # nor everything tiny


def test_compact_files_sizing_fallback_matches_plan_stats(spark, tmp_path):
    """The Spark Connect fallback (summing inputFiles' on-disk bytes)
    must agree with the JVM plan-stats path on a plain scan — same
    file-footer bytes, two routes."""
    from a_share_data_pipeline_spark.operators.layout import _input_file_bytes

    frag = str(tmp_path / "frag")
    load_table(spark, SF, "events").repartition(8).write.parquet(frag)
    df = spark.read.parquet(frag)
    jvm = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    walked = _input_file_bytes(df)
    # plan stats apply a (default 1.0) compression factor on top of the
    # same file sizes; equality holds at defaults, tolerate rounding
    assert abs(jvm - walked) <= max(64, jvm // 100)


def test_driver_hist_names_reverified_in_current_sweep():
    """VERDICT r10 item 6: the 40+ rotated-out names carry driver-green
    history, but that history AGES as the code evolves — the full-
    catalog sf0.1 sweep is what re-proves them each round. Pin that
    every pass-h (driver_hist) name appears GREEN (exact /
    replay-exact) in the NEWEST committed SWEEP_SF01_r*.jsonl, so a
    silent regression in a rotated-out name can never hide behind its
    old CORRECTNESS row."""
    import glob
    import json
    import os
    import re

    from a_share_data_pipeline_spark.plans.catalog import verification_tiers

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sweeps = sorted(
        glob.glob(os.path.join(repo, "SWEEP_SF01_r*.jsonl")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    assert sweeps, "no committed sf0.1 sweep artifact"
    status = {}
    with open(sweeps[-1]) as f:
        for line in f:
            if line.strip():
                rec = json.loads(line)
                status[rec["name"]] = rec.get("status")
    stale = [
        n
        for n in verification_tiers(repo)["driver_hist"]
        if status.get(n) not in ("exact", "replay-exact")
    ]
    assert not stale, (
        f"driver-hist names not re-proved in {os.path.basename(sweeps[-1])}: "
        f"{stale} — their old driver rows no longer stand for current code"
    )


def test_core_window_is_exactly_the_driver_prefix(spark):
    """The driver verifies only the first ~50 catalog entries; this pins
    that the prefix IS the covering CORE_WINDOW (50 entries, ordered),
    so an accidental import-order or registration change cannot silently
    push an operator family out of the verification window."""
    from a_share_data_pipeline_spark.plans.catalog import CORE_WINDOW, registry

    names = list(registry())
    assert len(CORE_WINDOW) == 50
    assert tuple(names[:50]) == tuple(CORE_WINDOW)
    # every family prefix that must be driver-verified has a witness
    # (sql_ left the list in r9: sql_in_subquery rotated out, its
    # decorrelation ⊂ join_semi_anti's LeftSemi plan shape, gated
    # locally by test_plan_quality; scalar_ left in r10: scalar_string
    # rotated out, the scalar surface ⊂ canonical_assembly's F1-F6
    # date/string casts + the local scalar_* oracle diffs;
    # stats_/geo_/audit_ joined as their families gained window rows
    # in r8/r9, profile_/table_/source_ in r10; sql_ REJOINED in r11
    # via sql_recursive_cte, and privacy_/forecast_ gained their first
    # window rows in r11)
    # (abc_/assoc_/search_/split_ gained their first window rows in
    # r12 via the ABC/Pareto, market-basket, hybrid-search and
    # temporal-split family witnesses)
    for prefix in ("agg_", "window_", "join_", "udf_",
                   "dedup_", "sim_", "text_", "events_", "multimodal_",
                   "curation_", "sample_", "stats_", "geo_", "audit_",
                   "profile_", "table_", "source_", "stream_",
                   "sql_", "privacy_", "forecast_",
                   "abc_", "assoc_", "search_", "split_"):
        assert any(n.startswith(prefix) for n in CORE_WINDOW), prefix
    # round-3 rotation: the round-2 operator families must sit INSIDE
    # the driver window, witnessed by these exact (stable) names
    # (sim_ann_pq rotated back out in r5 — its encode+ADC path is
    # composed verbatim inside the in-window sim_ann_ivfpq;
    # dedup_incremental / dedup_keep_canonical / curation_pii_redact
    # rotated back out in r8, subsumed by stream_incremental_dedup,
    # dedup_components and curation_pipeline respectively)
    assert "curation_pipeline" in CORE_WINDOW
    # round-4 rotation (VERDICT r3 item 5): the last never-driver-
    # verified families entered the window (layout_zorder and
    # source_jsonl rotated back out in r10 with driver-green history —
    # write-layout ⊂ sim_ann_index_scan's stored partition-pruned
    # layout, lines-read ⊂ source_txn_log_snapshot's log-replay read)
    assert "sample_mixture" in CORE_WINDOW
    # round-5 rotation (VERDICT r4 item 2): the strongest round-4
    # families enter; the PQ family stays witnessed via sim_ann_ivfpq
    # (dedup_substring rotated back out in r7: fingerprint-window
    # family stays witnessed via curation_line_dedup;
    # stream_stream_join rotated back out in r13 with driver-green
    # r5-r12 history: watermarked stream-stream interval join ⊂
    # join_interval_overlap's bucketized interval join, and the
    # stream_ family keeps three window rows incl. stream_dedup)
    for name in ("dedup_semantic", "curation_line_dedup",
                 "sim_ann_ivfpq"):
        assert name in CORE_WINDOW, name
    # round-6 rotation (VERDICT r5 item 1): five never-driver-verified
    # operator FAMILIES entered — iterative rank, I/U/D change apply,
    # ranked retrieval, chained-window kline indicator, interval join
    # (cdc_apply rotated back out in r10 with driver-green history:
    # I/U/D apply ⊂ cdc_time_travel's multi-version AS OF over the
    # same change-log; events_macd rotated back out in r11:
    # chained-EMA ⊂ bucketed_ma's frame windows + the events_
    # family's remaining window rows)
    for name in ("graph_pagerank", "text_bm25",
                 "join_interval_overlap"):
        assert name in CORE_WINDOW, name
    # round-7 rotation (VERDICT r6 item 2): five never-driver-verified
    # families enter — stored-index ANN serving, streaming incremental
    # dedup, SCD2 temporal dimension, join IVM, sketch algebra
    # (agg_sketch_merge rotated back out in r13 with driver-green
    # r7-r12 history: merged-shard HLL algebra ⊂ agg_hll_intersect's
    # inclusion-exclusion set algebra, which composes the same merge)
    for name in ("sim_ann_index_scan", "stream_incremental_dedup",
                 "scd2_dim_history", "incremental_join_delta"):
        assert name in CORE_WINDOW, name
    # round-8 rotation (VERDICT r7 item 1): five never-driver-verified
    # families entered — of those, only geo_dbscan_grid remains in the
    # window (the other four rotated back out in r11 with driver-green
    # r8-r10 history: BH ⊂ stats_welch_ttest + local stats_* diffs,
    # cdc_time_travel closes the fully-witnessed cdc_ family,
    # curation_model_filter ⊂ curation_pipeline's composed gates,
    # agg_moments_merge ⊂ agg_sketch_merge's merged-shard algebra)
    assert "geo_dbscan_grid" in CORE_WINDOW
    # round-9 rotation (VERDICT r8 item 1): five never-driver-verified
    # families entered — ordered conversion funnel, cohort retention,
    # multi-table referential-integrity audit, Bloom-sketch join prune,
    # unequal-variance inference (events_retention rotated back out in
    # r12 with driver-green r9-r11 history: cohort day-N return ⊂ the
    # events_ family's remaining window rows; events_funnel rotated
    # back out in r13 with driver-green r9-r12 history: ordered
    # conversion ⊂ local events_window_funnel oracle + the family's
    # retained rows; join_bloom_prune rotated back out in r13 with
    # driver-green r9-r12 history: Bloom broadcast prune ⊂
    # join_semi_anti's LeftSemi shape + local sketch oracles)
    for name in ("audit_referential_integrity",
                 "stats_welch_ttest"):
        assert name in CORE_WINDOW, name
    # round-10 rotation (VERDICT r9 item 1): five never-driver-verified
    # families enter — PPJoin prefix-filter similarity join, drift
    # monitoring (integer-exact TVD), multi-touch attribution,
    # snapshot diff / data versioning, lakehouse log-replay read
    # (profile_distribution_drift rotated back out in r13 with
    # driver-green r10-r12 history: integer-exact TVD drift ⊂
    # profile_chi_square's dependence-audit shape + local profile_*
    # diffs)
    for name in ("dedup_jaccard_prefix",
                 "events_attribution", "table_diff",
                 "source_txn_log_snapshot"):
        assert name in CORE_WINDOW, name
    # round-11 rotation (VERDICT r10 item 1): five never-driver-verified
    # families enter — streaming SCD2 upsert, Spark-4 SQL recursion,
    # gaps-and-islands streaks, k-anonymity generalization,
    # forecasting/rolling models
    for name in ("stream_scd2_apply", "sql_recursive_cte",
                 "events_streaks", "privacy_generalize",
                 "forecast_linear"):
        assert name in CORE_WINDOW, name
    # round-12 rotation (VERDICT r11 item 1): five never-driver-verified
    # families enter — ABC/Pareto classification, market-basket
    # 2-itemset mining, hybrid-search reciprocal-rank fusion, temporal
    # ML splits with embargo, multi-resolution time rollup (out:
    # join_range, agg_grouping_sets, set_ops, dedup_exact,
    # events_retention — all subsumed, driver-green history stands)
    for name in ("abc_classification", "assoc_market_basket",
                 "search_rrf", "split_temporal_embargo",
                 "events_multires_rollup"):
        assert name in CORE_WINDOW, name
    # round-13 rotation (VERDICT r12 item 1): five never-driver-verified
    # families enter — streaming exact dedup-within-watermark,
    # dependence/concentration audits (integer χ²), sequential
    # patterns (Markov transitions), HLL sketch set algebra
    # (inclusion-exclusion), trending rank (z-score vs trailing
    # window) (out: stream_stream_join, events_funnel,
    # profile_distribution_drift, agg_sketch_merge, join_bloom_prune
    # — all subsumed, driver-green history stands)
    for name in ("stream_dedup", "profile_chi_square",
                 "events_markov_transitions", "agg_hll_intersect",
                 "events_trending"):
        assert name in CORE_WINDOW, name
    assert any(n.startswith("stream_") for n in CORE_WINDOW)


def test_coverage_totals_match_live_catalog():
    """COVERAGE.md's totals line is generated, not hand-written
    (VERDICT r5: the hand-written '137 = 50 + 87' went stale while the
    registry grew to 177). Both COVERAGE.md and the generated
    QUERIES.md must carry exactly catalog.totals_markdown()."""
    import os

    from a_share_data_pipeline_spark.plans.catalog import (
        catalog_markdown,
        catalog_totals,
        totals_markdown,
    )

    t = catalog_totals()
    assert t["total"] == t["core"] + t["extended"]
    line = totals_markdown()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "COVERAGE.md")) as f:
        assert line in f.read().replace("\n", " ").replace("  ", " ") or line in open(
            os.path.join(repo, "COVERAGE.md")
        ).read(), "COVERAGE.md totals line != totals_markdown()"
    assert line in catalog_markdown()


def test_coverage_tiers_block_matches_live_history():
    """COVERAGE.md's verification-tier split is generated from
    CORE_WINDOW ∪ the committed CORRECTNESS_r*.json history, never
    hand-written (VERDICT r6 item 5: the hand-written 'window covers
    every §2.12 operator' claim went stale as the catalog grew). Pin
    that the committed block equals the live generator output and that
    the tiers partition the registry."""
    import os

    from a_share_data_pipeline_spark.plans.catalog import (
        registry,
        tiers_markdown,
        verification_tiers,
    )

    t = verification_tiers()
    names = set(registry())
    assert set(t["driver"]) | set(t["driver_hist"]) | set(t["local_only"]) == names
    assert len(t["driver"]) + len(t["driver_hist"]) + len(t["local_only"]) == len(names)
    assert len(t["driver"]) == 50
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "COVERAGE.md")) as f:
        cov = f.read()
    block = cov.split("tests/test_scale_ops.py::test_coverage_tiers_block_matches_live_history) -->")[1]
    block = block.split("<!-- tiers:end -->")[0].strip()
    assert block == tiers_markdown().strip(), (
        "COVERAGE.md tiers block is stale — regenerate with "
        "catalog.tiers_markdown()"
    )


def test_stamp_bench_acceptance_gates():
    """VERDICT r11 item 2: 'quietest window observed' must be a rule,
    not judgment. Pin stamp_bench.accept()'s gates: canary floors,
    series-minimum, and the shape checks — including the mid-run-stall
    case (clean canaries, inflated total) that only the series minimum
    catches."""
    import stamp_bench as SB

    quiet_canary = {
        "iter_first": 2.0, "iter_last": 1.8,
        "scan_first": 0.45, "scan_last": 0.42,
    }
    rec = {
        "value": 100.0, "sf": 0.1, "members_hash": "a" * 12,
        "method_v": "xxhash64-full-gc1+tmpfs+canary2",
        "canary": dict(quiet_canary),
    }
    logged = [dict(rec)]
    assert SB.accept(rec, logged) == []
    # stalled host: iter canary min over floor × tol
    bad = dict(rec, canary=dict(quiet_canary, iter_first=9.0, iter_last=3.0))
    assert any("stalled host" in f for f in SB.accept(bad, [bad]))
    # mid-run stall: clean canaries at both ends, total above the
    # round's series minimum (the r11 extended +75.7% case)
    stalled_mid = dict(rec, value=130.0)
    fails = SB.accept(stalled_mid, [dict(rec), stalled_mid])
    assert any("series minimum" in f for f in fails)
    # series gate only compares runs with matching membership+method
    other = dict(rec, members_hash="b" * 12, value=50.0)
    assert SB.accept(rec, [other, dict(rec)]) == []
    # no logged peers at all → refuse (the receipt series is required)
    assert any("no logged runs" in f for f in SB.accept(rec, [other]))
    # receipt completeness (ADVICE r12): peers exist but the CANDIDATE
    # itself was never logged → refuse (the committed receipt must
    # provably contain the stamped run)
    unlogged = SB.accept(rec, [dict(rec, value=100.5)])
    assert any("missing from the logged" in f for f in unlogged)
    # wrong sf / missing fields refuse
    assert any("sf=" in f for f in SB.accept(dict(rec, sf=0.01), logged))
    nomh = {k: v for k, v in rec.items() if k != "method_v"}
    assert any("method_v" in f for f in SB.accept(nomh, logged))
    # floors are committed constants — a drive-by loosening shows up
    # as a diff on BOTH the constant and this pin
    assert SB.ITER_FLOOR == 1.72 and SB.SCAN_FLOOR == 0.41
    assert SB.CANARY_TOL == 1.25 and SB.TOTAL_TOL == 1.01


def test_bench_record_stays_driver_parseable():
    """The driver captures only a 2,000-char stdout tail and parses the
    LAST line; rounds 4 and 6 both lost their bench record
    (``parsed: null``) when the per-query map grew past the window.
    Pin the round-14 contract (VERDICT r13 items 4/6): the base record
    stays compact, the restored per-query map keeps the whole line
    under the 1,950-char guard at realistic value widths for the
    CURRENT headline membership, every headline/extended name resolves
    in the registry, and the two sets are disjoint with the headline
    frozen to CORE_WINDOW + the fixed representatives."""
    import json

    import bench

    from a_share_data_pipeline_spark.plans.catalog import CORE_WINDOW, registry

    reg = registry()
    assert [n for n in bench.HEADLINE if n not in reg] == []
    assert [n for n in bench.EXTENDED if n not in reg] == []
    assert set(bench.HEADLINE).isdisjoint(bench.EXTENDED)
    assert bench.HEADLINE[: len(CORE_WINDOW)] == list(CORE_WINDOW)
    assert len(bench.HEADLINE) <= 62  # window + ~10 representatives
    # worst-case compact record: every field at its widest (r11 added
    # the fixed host-canary pair, the substrate flag and the
    # membership fingerprint — all fixed-size, so the record still
    # cannot grow with the catalog)
    record = {
        "metric": "headline_queries_total_sec",
        "value": 99999.999,
        "unit": "sec",
        "n_queries": len(bench.HEADLINE),
        "sf": 100.0,
        "method": "xxhash64-full-gc1",
        "method_v": "xxhash64-full-gc1+tmpfs+canary2",
        "tmpfs": True,
        "members_hash": "a" * 12,
        "canary": {
            "iter_first": 99999.999,
            "scan_first": 99999.999,
            "iter_last": 99999.999,
            "scan_last": 99999.999,
        },
        "n_skipped": len(bench.HEADLINE),
    }
    assert len(json.dumps(record)) < 800
    # round-14: the per-query map is back on the stdout line (compact
    # separators, 2-decimal minima). At realistic widths — every query
    # up to 999.99s — the full line must clear the 1,950-char guard
    # for the current headline membership; bench.py itself degrades by
    # dropping the map if a future membership outgrows the budget, so
    # parsed:null can never recur either way.
    record["queries"] = {n: 999.99 for n in bench.HEADLINE}
    line = json.dumps(record, separators=(",", ":"))
    assert len(line) < 1950, f"headline per-query line {len(line)} chars"
    # the canary names are frozen (never rotated) and resolve to real
    # callables producing DataFrames at any SF
    assert set(bench.CANARIES) == {"iter", "scan"}


def test_pq_codebook_training_improves_recall(spark):
    """One+ Lloyd rounds over the per-subspace codebooks must beat the
    untrained first-k init on recall@3 (measured: 0.125 -> 0.25 on the
    fixture). The catalog query keeps refine_iters=0 so its oracle
    stays a single SQL expression; this pins that the trained path the
    docstring promises actually pays."""
    from a_share_data_pipeline_spark.operators import similarity as SIM

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", SIM.as_double_vec("embedding", "v")
    )
    vectors = emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )

    def topk_sets(df, k=3):
        out: dict[int, set] = {}
        for r in df.collect():
            if r.rnk <= k:
                out.setdefault(r.q_id, set()).add(r.c_id)
        return out

    exact = topk_sets(SIM.brute_force_topk(vectors, queries, k=3))

    def recall(approx):
        hits = total = 0
        for q, want in exact.items():
            hits += len(approx.get(q, set()) & want)
            total += len(want)
        return hits / total

    base = recall(topk_sets(SIM.pq_adc_topk(vectors, queries, k=3)))
    trained = recall(topk_sets(SIM.pq_adc_topk(vectors, queries, k=3, refine_iters=2)))
    assert trained > base, (base, trained)
    assert trained >= 0.2, trained


def test_ivf_pq_consistent_with_pq_and_cell_restricted(spark):
    """IVF-PQ must score with the SAME ADC distances as plain PQ (same
    codebook → identical fixed-point sums for any shared pair) while
    returning only candidates from the probed cells, and still find
    genuinely-near neighbors."""
    from a_share_data_pipeline_spark.operators import similarity as SIM

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", SIM.as_double_vec("embedding", "v")
    )
    vectors = emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("ce")
    )
    full = {
        (r.q_id, r.c_id): r.adist
        for r in SIM.pq_adc_topk(vectors, queries, k=100).collect()
    }
    ivfpq = SIM.ivf_pq_topk(vectors, queries, centroids, k=3, nprobe=2).collect()
    assert ivfpq
    per_q: dict[int, int] = {}
    for r in ivfpq:
        per_q[r.q_id] = per_q.get(r.q_id, 0) + 1
        if (r.q_id, r.c_id) in full:
            assert full[(r.q_id, r.c_id)] == r.adist, (r.q_id, r.c_id)
    assert all(n <= 3 for n in per_q.values())
    # probed-cell restriction: each returned candidate's cell must be
    # one of its query's nprobe cells
    cells = {
        r.c_id: r.cell
        for r in SIM.ivf_assign(vectors, centroids, "c_id", "cv", nprobe=1).collect()
    }
    probes: dict[int, set] = {}
    for r in SIM.ivf_assign(queries, centroids, "q_id", "qv", nprobe=2).collect():
        probes.setdefault(r.q_id, set()).add(r.cell)
    for r in ivfpq:
        assert cells[r.c_id] in probes[r.q_id], (r.q_id, r.c_id)


def test_redact_pii_counts_and_sequential_semantics(spark):
    """Counts reflect the text state each pattern actually sees: the
    email pass runs first, so digits inside an address never re-count
    as a phone/IP; clean text passes through byte-identical."""
    from a_share_data_pipeline_spark.operators.curation import redact_pii

    rows = [
        (1, "reach a.b@x.com or 10.1.2.3 call +1-202-555-0100 now"),
        (2, "plain text with no contact details at all"),
        (3, "two mails p@q.io and r.s%t@u-v.org here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}

    r1 = out[1]
    assert (r1.n_email, r1.n_ipv4, r1.n_phone) == (1, 1, 1)
    assert "<EMAIL>" in r1.text_redacted and "<IP>" in r1.text_redacted
    assert "<PHONE>" in r1.text_redacted
    for raw in ("a.b@x.com", "10.1.2.3", "+1-202-555-0100"):
        assert raw not in r1.text_redacted

    r2 = out[2]
    assert (r2.n_email, r2.n_ipv4, r2.n_phone) == (0, 0, 0)
    assert r2.text_redacted == rows[1][1]

    assert out[3].n_email == 2
    assert out[3].text_redacted.count("<EMAIL>") == 2


def test_mixture_rates_cap_and_target_shape(spark):
    """rate = min(1, budget*w/n): an under-represented group saturates
    at 1.0 (can't invent docs), an over-represented one is cut to the
    budgeted share."""
    from a_share_data_pipeline_spark.operators.curation import mixture_rates

    counts = spark.createDataFrame(
        [("big", 100), ("small", 10)], "source string, n long"
    )
    rates = {
        r.source: r.keep_rate
        for r in mixture_rates(
            counts, {"big": 0.5, "small": 0.5}, 0.1, F.lit(40.0)
        ).collect()
    }
    assert rates["big"] == 0.2  # 40*0.5/100
    assert rates["small"] == 1.0  # 40*0.5/10 = 2.0, capped


def test_keep_canonical_is_longest_per_component(spark):
    """dedup_keep_canonical returns exactly one survivor per component,
    and it is the component's longest doc (ties to min doc_id)."""
    from a_share_data_pipeline_spark.plans.queries_llm import (
        dedup_components,
        dedup_keep_canonical,
    )

    comp = {r.doc_id: r.component for r in dedup_components(spark, SF).collect()}
    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    kept = dedup_keep_canonical(spark, SF).collect()

    assert len({r.component for r in kept}) == len(kept)  # one per component
    assert {r.component for r in kept} == set(comp.values())
    for r in kept:
        members = [d for d, c in comp.items() if c == r.component]
        best = min(members, key=lambda d: (-docs[d], d))
        assert r.doc_id == best, (r.component, r.doc_id, best)


def test_quantile_sketch_brackets_exact_percentiles(spark):
    """agg_quantile_sketch: each histogram-interpolated estimate must
    land within one bin width of the exact percentile, quantiles must
    be monotone, and the merged sketch must be tiny (n_bins bounded by
    the literal domain, not the data)."""
    from a_share_data_pipeline_spark.plans.queries_core import (
        _QS_WIDTH,
        agg_quantile_sketch,
    )

    rows = {r.q: r for r in agg_quantile_sketch(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    exact = li.selectExpr(
        "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95)) AS p"
    ).collect()[0]["p"]
    for q, ex in zip(sorted(rows), exact):
        assert abs(rows[q].est - ex) <= _QS_WIDTH, (q, rows[q].est, ex)
    ests = [rows[q].est for q in sorted(rows)]
    assert ests == sorted(ests)
    assert all(r.n_bins <= 60 for r in rows.values())


def test_sample_negatives_guards_component_mates(spark):
    """sample_negatives: no emitted negative may share a near-dup
    component with its anchor (the false-negative guard IS the
    operator), no self-pairs, j stays within 0..k-1, and the picks are
    byte-identical across reruns (no RNG)."""
    from a_share_data_pipeline_spark.plans.queries_llm import (
        _NEG_K,
        dedup_components,
        sample_negatives,
    )

    out = sorted(
        (r.anchor_id, r.j, r.neg_id) for r in sample_negatives(spark, SF).collect()
    )
    assert out, "sampler emitted nothing"
    comp = {r.doc_id: r.component for r in dedup_components(spark, SF).collect()}
    for anchor, j, neg in out:
        assert neg != anchor
        assert comp[anchor] != comp[neg], (anchor, neg)
        assert 0 <= j < _NEG_K
    rerun = sorted(
        (r.anchor_id, r.j, r.neg_id) for r in sample_negatives(spark, SF).collect()
    )
    assert rerun == out


def test_pit_join_is_equi_keyed_and_leak_free(spark):
    """join_pit_scd2: the temporal join must plan as an EQUI join on
    the entity key (hash/sort-merge; never a nested-loop cartesian),
    emit exactly one row per fact (SCD2 intervals partition the
    timeline), and never attach a version from the fact's future."""
    from a_share_data_pipeline_spark.plans.queries_pipeline import join_pit_scd2

    q = join_pit_scd2(spark, SF)
    p = plan_str(q, "simple")
    assert "NestedLoop" not in p and "Cartesian" not in p, p
    assert "HashJoin" in p or "SortMergeJoin" in p, p

    rows = q.collect()
    facts = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "view")
        .count()
    )
    assert len(rows) == facts  # one row per fact, no interval explode

    hist = {}
    for r in (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .collect()
    ):
        hist.setdefault(r.user_id, []).append(r.ts)
    for r in rows:
        past = [t for t in hist.get(r.user_id, []) if t <= r.ts]
        assert (r.tier is None) == (not past), (r.user_id, r.ts)


def test_k_anonymity_classes_cover_all_rows(spark):
    """profile_k_anonymity: class sizes must sum to the table row
    count (every row is in exactly one equivalence class), l_diversity
    can never exceed class_size, and at_risk tracks the k literal."""
    from a_share_data_pipeline_spark.plans.queries_profile import (
        _KANON_K,
        profile_k_anonymity,
    )

    rows = profile_k_anonymity(spark, SF).collect()
    total = load_table(spark, SF, "customer").count()
    assert sum(r.class_size for r in rows) == total
    for r in rows:
        assert 1 <= r.l_diversity <= r.class_size
        assert r.at_risk == (r.class_size < _KANON_K)


def test_importance_resampling_flattens_length_distribution(spark):
    """sample_importance: the resampled bin shares must be closer to
    the uniform target than the originals (max share strictly drops
    unless already uniform), and under-represented bins must keep
    every doc (rate caps at 1)."""
    from a_share_data_pipeline_spark.plans.queries_profile import (
        _IMP_BINS,
        _IMP_WIDTH,
        sample_importance,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    bins = {
        r.doc_id: min(int(r.n_chars // _IMP_WIDTH), _IMP_BINS - 1) for r in docs
    }
    before: dict[int, int] = {}
    for b in bins.values():
        before[b] = before.get(b, 0) + 1

    kept = sample_importance(spark, SF).collect()
    assert kept
    after: dict[int, int] = {}
    for r in kept:
        assert r.bin == bins[r.doc_id]
        after[r.bin] = after.get(r.bin, 0) + 1

    n0, n1 = sum(before.values()), sum(after.values())
    max_before = max(v / n0 for v in before.values())
    max_after = max(after.get(b, 0) / n1 for b in before)
    assert max_after <= max_before + 1e-9
    # the most starved bin keeps all of its docs (its keep rate is 1)
    starved = min(before, key=lambda b: before[b])
    assert after.get(starved, 0) == before[starved]


def test_rolling_distinct_dominates_daily_distinct(spark):
    """window_rolling_distinct: the 7-day rolling distinct count must
    dominate each day's own distinct count, never exceed the 7-day
    pair-sum upper bound, and equal the single-day count on the first
    observed day (its window reaches only itself)."""
    from a_share_data_pipeline_spark.plans.queries_core import (
        window_rolling_distinct,
    )

    rows = {r.day: r.exact_u7 for r in window_rolling_distinct(spark, SF).collect()}
    assert rows and all(r > 0 for r in rows.values())
    pairs = (
        load_table(spark, SF, "events")
        .select(F.date_trunc("day", "ts").cast("date").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    daily: dict = {}
    for p in pairs:
        daily.setdefault(p.day, set()).add(p.user_id)
    assert set(rows) == set(daily)
    for d, u7 in rows.items():
        assert u7 >= len(daily[d])
        window = [dd for dd in daily if 0 <= (d - dd).days <= 6]
        assert u7 <= sum(len(daily[dd]) for dd in window)
        assert u7 == len(set().union(*(daily[dd] for dd in window)))
    first = min(daily)
    assert rows[first] == len(daily[first])


def test_er_resolve_clusters_are_consistent(spark):
    """er_resolve: canonical_key must be the MIN member of each
    cluster, members of a pair always share a cluster, n_members
    matches the cluster's row count, and only matched records appear."""
    from a_share_data_pipeline_spark.plans.queries_profile import (
        er_resolve,
        join_fuzzy_blocked,
    )

    out = er_resolve(spark, SF).collect()
    assert out
    by_comp: dict = {}
    for r in out:
        by_comp.setdefault(r.canonical_key, []).append(r)
    for comp, members in by_comp.items():
        assert comp == min(m.p_partkey for m in members)
        assert all(m.n_members == len(members) for m in members)
    lbl = {r.p_partkey: r.canonical_key for r in out}
    pairs = join_fuzzy_blocked(spark, SF).collect()
    assert pairs
    for p in pairs:
        assert lbl[p.key_a] == lbl[p.key_b]
    assert set(lbl) == {k for p in pairs for k in (p.key_a, p.key_b)}


def test_curriculum_orders_quality_first(spark):
    """curation_curriculum: stages partition the corpus by the quality
    thresholds, every stage-0 doc outranks every stage-2 doc in
    (stage, key) order, the corpus is fully covered, and the key is
    rerun-deterministic."""
    from a_share_data_pipeline_spark.plans.queries_curation import (
        _CURR_HI,
        _CURR_MID,
        curation_curriculum,
    )

    rows = curation_curriculum(spark, SF).collect()
    total = load_table(spark, SF, "documents").count()
    assert len(rows) == total
    stages = {r.stage for r in rows}
    assert stages == {0, 1, 2}, stages  # fixture spans all stages
    for r in rows:
        if r.stage == 0:
            assert r.quality_score >= _CURR_HI
        elif r.stage == 1:
            assert _CURR_MID <= r.quality_score < _CURR_HI
        else:
            assert r.quality_score < _CURR_MID
    rerun = {r.doc_id: r.curriculum_key for r in curation_curriculum(spark, SF).collect()}
    assert rerun == {r.doc_id: r.curriculum_key for r in rows}


def test_quantile_sketch_plan_is_partial_aggregated(spark):
    """agg_quantile_sketch: the shard histogram must partial-aggregate
    before its exchange (the sketch property — shards x bins rows per
    task, never raw rows), and no Python lane appears."""
    from a_share_data_pipeline_spark.plans.queries_core import agg_quantile_sketch

    p = executed_plan_str(agg_quantile_sketch(spark, SF))
    assert "partial" in p.lower(), p[:2000]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_importance_resampling_broadcasts_rate_table(spark):
    """sample_importance: the rate table must reach the corpus via a
    broadcast join (map-side filter), never a shuffled join of the
    corpus against an 8-row frame."""
    from a_share_data_pipeline_spark.plans.queries_profile import sample_importance

    p = executed_plan_str(sample_importance(spark, SF))
    assert "BroadcastHashJoin" in p, p[:2000]
    assert "SortMergeJoin" not in p, p[:2000]


def test_sample_negatives_never_plans_cartesian(spark):
    """sample_negatives: candidate generation is a bounded explode off
    the tiny anchor set; nothing in the plan may be a cartesian
    product over the corpus."""
    from a_share_data_pipeline_spark.plans.queries_llm import sample_negatives

    p = executed_plan_str(sample_negatives(spark, SF))
    assert "CartesianProduct" not in p, p[:2000]


def test_round13_width_clones_leave_caller_width_untouched(spark):
    """Measured-width clones (graph_pagerank + cc_incremental; the
    r13 graph_label_propagation clone was REVERTED in round 14 —
    the driver's r13 record and the r14 fresh-subprocess interleaved
    A/B both read it slower, VERDICT r13 item 3 / OPTIMIZATION_r14.md;
    bfs/kcore/closeness/components were measured net-negative in the
    applied form and deliberately left alone, OPTIMIZATION_r13.md §6):
    each runs its iterative rounds in a CLONED session whose shuffle
    width is sized from the measured edge/pair count. The caller's
    width must never move, and at smoke scale (counts far below
    8·64Ki) the clone must land exactly on the volume rule's floor of
    8 — proving the sizing really derives from the data, not the CPU
    count."""
    from a_share_data_pipeline_spark.plans.catalog import registry

    pkey = "spark.sql.shuffle.partitions"
    before = spark.conf.get(pkey)
    spark.conf.set(pkey, "12")  # distinctive caller width
    reg = registry()
    try:
        for name in (
            "graph_pagerank",
            "graph_cc_incremental",
        ):
            out = reg[name].fn(spark, SF)
            assert out.sparkSession is not spark, name
            assert out.sparkSession.conf.get(pkey) == "8", name
            assert out.count() > 0, name
            assert spark.conf.get(pkey) == "12", name
    finally:
        spark.conf.set(pkey, before)
