"""Deduplication operators for training-data pipelines (SURVEY.md §2.12).

All hashes are md5-based so the DuckDB oracle can recompute them
exactly (see functions/hashing.py). Everything stays JVM-side —
built-in expression trees only, no Python UDFs in any hot path.

Scale design:
- exact dedup groups on md5(text), not the full text → the shuffle
  carries 32-byte keys instead of multi-KB documents,
- MinHash/LSH: shingle explode → groupBy(doc) agg of k min-hashes →
  band join. The candidate join is on (band_id, band_hash), so only
  colliding docs meet — never an all-pairs product,
- n-gram Jaccard runs on LSH candidates or shingle-bucket joins with a
  minimum-overlap prune (HAVING n >= k) before the ratio.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_BAND_SIZE, MINHASH_SEEDS
from .common import spread as _spread

_LOG = logging.getLogger(__name__)


def word_shingles_col(text_col: str = "text", n: int = 3) -> "F.Column":
    """`array<string>` of distinct word n-grams as a Column expression.

    The token array is LET-BOUND through a single-element transform so
    the ~3·m element_at references hit a bound VALUE — referencing the
    raw split() expression instead re-evaluates the split per reference
    (the CollapseProject inlining hazard measured on winnowing,
    SCALE.md "let-binding lesson")."""

    def build(toks: "F.Column") -> "F.Column":
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(toks, i + off) for off in range(n)]
        )
        return F.when(
            F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(
        F.transform(F.array(F.split(F.col(text_col), " ")), build), 1
    )


def with_word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Add `shingles: array<string>` of distinct word n-grams."""
    return df.withColumn("shingles", word_shingles_col(text_col, n))


def exploded_shingles(
    df: DataFrame, id_col: str = "doc_id", spread: bool = True
) -> DataFrame:
    """(id, shingle) pairs, distinct per doc.

    Repartitions the input first (common.spread): document tables often
    arrive in a handful of file splits, and the explode fans out
    50-100× — without the repartition all that expansion (and the md5
    work downstream) runs in as few tasks as there are splits.
    ``spread=False`` skips that shuffle — for callers exploding an
    already-candidate-restricted handful of docs (the LSH verify step),
    where the repartition costs a whole extra stage to balance work
    that fits in one task anyway.
    """
    if spread:
        df = _spread(df, id_col)
    # explode the EXPRESSION, not a withColumn alias: exploding a named
    # column makes Catalyst infer `size(c)>0 AND c IS NOT NULL`,
    # substitute the full shingle expression into it, and push that
    # below the exchange — evaluating the array construction 3× per
    # row on the pre-repartition (often single) partition
    return df.select(id_col, F.explode(word_shingles_col()).alias("shingle"))


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", with_counts: bool = False
) -> DataFrame:
    """k min-hashes per doc: h_i = min(md5(i || '|' || shingle)) over the
    HEX STRING order — a uniform permutation family reproducible in SQL.

    with_counts=True also emits `n_sh` (distinct-shingle count) from the
    SAME aggregation — callers that need both (LSH verify) save a second
    full pass over the exploded shingle set."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in MINHASH_SEEDS
    ]
    if with_counts:
        aggs.append(F.count(F.lit(1)).alias("n_sh"))
    return shingled.groupBy(id_col).agg(*aggs)


def _bucket_pairs(
    bucketed: DataFrame, id_col: str, max_bucket: int | None = None
) -> DataFrame:
    """(a, b) ordered pairs of ids sharing a bucket, via ONE aggregation:
    groupBy(bucket) → collect ids → drop singletons → expand pairs with
    an array-combinator expression. Versus a bucket self-join this halves
    the shuffles, and the overwhelmingly-singleton buckets are discarded
    in the (partially aggregated) groupBy instead of surviving into a
    join probe side.

    ``max_bucket`` is the hot-bucket guard (standard stop-shingle
    filter): a bucket shared by n ids expands to n(n-1)/2 pairs INSIDE
    one aggregate row, so a single stop-shingle shared by 1M docs would
    materialize ~5·10¹¹ pairs in one task. Buckets above the cap are
    dropped BEFORE expansion and the drop is counted and logged — never
    silent. The count costs one extra (cheap, partially-aggregated)
    job; pass None to skip both the guard and the job."""
    grouped = (
        bucketed.groupBy("bucket")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        n_hot = grouped.filter(F.size("ids") > max_bucket).count()
        if n_hot:
            _LOG.warning(
                "_bucket_pairs: dropping %d hot bucket(s) with > %d members "
                "before pair expansion (stop-shingle filter)",
                n_hot,
                max_bucket,
            )
        grouped = grouped.filter(F.size("ids") <= max_bucket)
    return (
        grouped
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)),"
                    "  y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )


def _band_buckets(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, bucket) rows: one bucket per LSH band, via a single
    posexplode of the band-hash array (a union-per-band shape would
    make Catalyst execute the upstream aggregation once per band)."""
    n_bands = len(MINHASH_SEEDS) // MINHASH_BAND_SIZE
    band_cols = [
        F.concat_ws(
            ",",
            *[f"h{i}" for i in MINHASH_SEEDS[b * MINHASH_BAND_SIZE : (b + 1) * MINHASH_BAND_SIZE]],
        )
        for b in range(n_bands)
    ]
    return signatures.select(
        F.col(id_col), F.posexplode(F.array(*band_cols)).alias("band", "band_hash")
    ).select(id_col, F.concat_ws("#", F.col("band"), F.col("band_hash")).alias("bucket"))


def lsh_band_candidates(
    signatures: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """Candidate pairs (a < b) sharing any band bucket — one pass over
    the signatures, then bucket-pair expansion."""
    return _bucket_pairs(_band_buckets(signatures, id_col), id_col, max_bucket=max_bucket).distinct()


def lsh_incremental_candidates(
    signatures: DataFrame,
    new_ids: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    bands: DataFrame | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental-corpus candidates: pairs sharing a band bucket where
    at least ONE side is a new doc. The standing corpus's old×old pairs
    are never formed (they were checked when those docs arrived) — the
    cost of absorbing a batch scales with the batch, not the corpus.
    The new batch's buckets broadcast (a batch is small vs the corpus);
    the corpus side stays a streamed probe of the bucket join.

    ``max_bucket`` is the hot-bucket guard for this path. Band buckets
    go hot exactly when the corpus carries mass-duplicated boilerplate —
    the thing dedup targets — and here the pairs form through a bucket
    JOIN rather than an array expansion, so the guard is a pre-join
    bucket-size filter: buckets above the cap are dropped from the
    corpus side (which removes every pair through them) BEFORE the join,
    counted and logged — never silent.

    Only buckets TOUCHED by a new doc can form a pair, so the whole
    probe — including the hot-bucket size count — is restricted to the
    touched buckets first with a map-side broadcast semi-join during
    the single corpus scan. An untouched bucket forms no pair whether
    or not it is hot, so the output is identical, but the bucket-size
    aggregation shuffles O(touched) rows instead of O(corpus) — the
    difference between an absorb step that scales with the batch and
    one that re-aggregates the store every batch (round-9 profile:
    this count was the second-largest per-batch cost in
    stream_incremental_dedup).

    ``bands`` / ``new_bands`` (VERDICT r10 item 4): a caller that
    maintains the band-bucket table as a standing derived store —
    stream_incremental_dedup pins it across micro-batches — passes it
    here so the corpus side is a memory-block scan of PRE-HASHED
    (id, bucket) rows instead of a per-call store scan that recomputes
    every band hash. ``bands`` must equal ``_band_buckets(signatures)``
    row-for-row (the caller's invariant); ``new_bands`` is its
    restriction to ``new_ids`` and is derived here when absent. The
    output is identical to the self-computed path — pinned by
    test_lsh_incremental_prebuilt_bands_identical."""
    if bands is None and new_bands is not None:
        # ADVICE r11: the self-computed branch below derives BOTH band
        # frames and would silently overwrite a caller-supplied
        # new_bands — there is no valid "new_bands without bands" call
        # (new_bands is a restriction OF bands), so fail loudly.
        raise ValueError(
            "lsh_incremental_candidates: new_bands was passed without "
            "bands — new_bands is the new-ids restriction of the "
            "prebuilt corpus band table and is meaningless alone; pass "
            "bands (and optionally new_bands), or neither"
        )
    if bands is None:
        # O(batch): the new docs' bands, computed from a broadcast-
        # restricted slice of the signature frame — never from the
        # full corpus scan
        sig_new = signatures.join(
            F.broadcast(new_ids.select(id_col)), id_col, "left_semi"
        )
        new_bands = _band_buckets(sig_new, id_col)
        all_bands = _band_buckets(signatures, id_col)
    else:
        all_bands = bands
        if new_bands is None:
            new_bands = bands.join(
                F.broadcast(new_ids.select(id_col)), id_col, "left_semi"
            )
    prebuilt = bands is not None
    touched = new_bands.select("bucket").distinct()
    # single corpus scan, map-side filtered to touched buckets
    bands = all_bands.join(F.broadcast(touched), "bucket", "left_semi")
    if max_bucket is not None:
        # the guard adds a second consumer of `bands` (the size count
        # below, then the pair join) — without an eager pin the corpus
        # scan runs once per consumer. The restricted frame is
        # O(batch bands + collisions) rows, so pinning it is cheap.
        # With PREBUILT bands the upstream is already checkpointed
        # memory blocks, so re-running the cheap semi-join filter per
        # consumer beats paying another checkpoint job per call
        # (measured in the r11 stream_incremental_dedup floor work)
        if not prebuilt:
            bands = bands.localCheckpoint(eager=True)
        hot = (
            bands.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_bucket)
            .select("bucket")
        )
        n_hot = hot.count()
        if n_hot:
            _LOG.warning(
                "lsh_incremental_candidates: dropping %d hot band bucket(s) "
                "(touched by this batch) with > %d members before the bucket "
                "join (stop-shingle filter; untouched hot buckets form no "
                "pairs and are skipped without counting)",
                n_hot,
                max_bucket,
            )
            # hot buckets are few by construction (each holds > max_bucket
            # of a finite corpus) — broadcast the anti-join side; the
            # probe side (new_bands) must drop them too, or a new doc
            # could still pair THROUGH a capped bucket via the join below
            bands = bands.join(F.broadcast(hot), "bucket", "left_anti")
            new_bands = new_bands.join(F.broadcast(hot), "bucket", "left_anti")
    n = new_bands.select(F.col(id_col).alias("__n_id"), "bucket")
    pairs = (
        bands.join(F.broadcast(n), "bucket")
        .filter(F.col("__n_id") != F.col(id_col))
        .select(
            F.least("__n_id", id_col).alias("a"),
            F.greatest("__n_id", id_col).alias("b"),
        )
    )
    return pairs.distinct()


def pair_overlap(
    shingled: DataFrame,
    pairs: DataFrame | None = None,
    min_overlap: int = 1,
    counts: DataFrame | None = None,
    max_bucket: int | None = None,
    restrict: bool = True,
) -> DataFrame:
    """(a, b, n_inter, n_a, n_b) per doc pair sharing >= ``min_overlap``
    shingles — the shared core every set-resemblance measure divides
    from (:func:`pair_jaccard` and :func:`pair_containment` are thin
    ratio selections over this output).

    With `pairs` given, restricts to those candidates (LSH verify step);
    otherwise considers every pair sharing >= min_overlap shingles.
    `counts` (doc_id, n_sh) can be supplied by a caller that already
    aggregated the shingle set (minhash_signatures with_counts=True).
    ``max_bucket``: stop-shingle guard for the no-candidate path — a
    shingle shared by more than this many docs is dropped (logged)
    before the quadratic pair expansion; intersections through such
    shingles are not counted, which is the standard near-dup trade
    (stop-shingles carry no signal and their buckets are the OOM risk).
    ``restrict=False`` asserts the caller ALREADY semi-joined
    ``shingled`` down to the candidate docs, skipping the internal
    restriction (one broadcast build + one semi-join per call — visible
    overhead in per-micro-batch use).
    """
    if counts is None:
        counts = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    else:
        counts = counts.select("doc_id", "n_sh")
    if pairs is not None and restrict:
        # verify path: only candidate docs enter the shingle self-join —
        # the candidate set is tiny relative to the corpus, so this
        # turns an O(corpus-pairs) join into O(candidate-docs) work
        cand_docs = (
            pairs.select(F.col("a").alias("doc_id"))
            .union(pairs.select(F.col("b").alias("doc_id")))
            .distinct()
        )
        shingled = shingled.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    inter = (
        _bucket_pairs(
            shingled.select("doc_id", F.col("shingle").alias("bucket")),
            "doc_id",
            max_bucket=max_bucket,
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .filter(F.col("n_inter") >= min_overlap)
    )
    if pairs is not None:
        inter = inter.join(pairs, ["a", "b"], "left_semi")
    ca = counts.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .select("a", "b", "n_inter", "n_a", "n_b")
    )


def pair_jaccard(
    shingled: DataFrame,
    pairs: DataFrame | None = None,
    min_overlap: int = 1,
    counts: DataFrame | None = None,
    max_bucket: int | None = None,
    restrict: bool = True,
) -> DataFrame:
    """Jaccard similarity per doc pair via shingle-bucket join — the
    symmetric-resemblance ratio over :func:`pair_overlap`'s counts
    (|A∩B| / |A∪B|); see that function for the candidate/guard
    parameters."""
    return pair_overlap(
        shingled,
        pairs=pairs,
        min_overlap=min_overlap,
        counts=counts,
        max_bucket=max_bucket,
        restrict=restrict,
    ).select(
        "a",
        "b",
        (
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("jaccard"),
    )


def pair_containment(
    shingled: DataFrame, min_overlap: int = 1, max_bucket: int | None = None
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT per doc pair: |A∩B| relative to
    each side's own shingle-set size — the excerpt/quote/sub-document
    signal Jaccard dilutes away (a short doc fully contained in a long
    one has containment 1.0 on its side but near-zero Jaccard, so a
    Jaccard threshold never finds it; Broder 1997 separates the two
    resemblance measures for exactly this reason).

    Thin selection over :func:`pair_overlap` — same bucketed single-
    aggregation pair expansion and hot-bucket cap, returning
    (a, b, n_inter, n_a, n_b) so the caller picks the directional
    ratio(s) it needs."""
    return pair_overlap(shingled, min_overlap=min_overlap, max_bucket=max_bucket)


def substring_dup_stats(
    df: DataFrame,
    win_tokens: int = 16,
    stride: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level duplication stats (the suffix-array exact-
    substring dedup of Lee et al., approximated with rolling windows):
    fingerprint every ``win_tokens``-token window at ``stride`` offsets,
    and count per doc how many of its windows also occur in >=
    ``min_docs`` - 1 OTHER documents — the cross-document duplicated-
    span signal line dedup misses when boilerplate is not segment-
    aligned. Only FULL windows fingerprint (a 3-token tail is not a
    16-token substring); docs shorter than the window report 0 windows.

    Scale shape: window explode fans out n/stride per doc (shuffles on
    md5 keys); the duplicated-fingerprint set is distinct-doc-counted
    in one partial-aggregated groupBy and broadcasts back (duplicated
    text is small vs the corpus); per-doc rollup is one aggregation."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_wins = F.when(
        n >= win_tokens,
        F.floor((n - win_tokens) / F.lit(float(stride))).cast("long") + 1,
    ).otherwise(F.lit(0).cast("long"))
    base = _spread(df.select(F.col(id_col), toks.alias("__toks"), n_wins.alias("__w")), id_col)
    wins = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("__w") > 0,
                F.sequence(F.lit(0).cast("long"), F.col("__w") - 1),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("wi"),
        F.col("__toks"),
    ).select(
        id_col,
        F.md5(
            F.concat_ws(
                " ", F.slice("__toks", (F.col("wi") * stride + 1).cast("int"), win_tokens)
            )
        ).alias("fp"),
    )
    hot = (
        wins.groupBy("fp")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("fp", F.lit(True).alias("__hot"))
    )
    per = (
        wins.join(F.broadcast(hot), "fp", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("__hot"), F.lit(False)).cast("long")).alias("n_dup"),
        )
    )
    from ..functions.rounding import dround

    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
            dround(
                F.when(
                    F.col("n_windows") > 0, F.col("n_dup") / F.col("n_windows")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_dup_substrings(
    df: DataFrame,
    win_tokens: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span REMOVAL companion to ``substring_dup_stats`` — the actual
    Lee et al. exact-substring dedup outcome: cut each doc into
    DISJOINT ``win_tokens``-token windows (tail remainder kept as a
    short final window), drop every window whose fingerprint occurs in
    >= ``min_docs`` DISTINCT documents, and reassemble the survivors in
    order. Stats use overlapping windows (stride < win) for detection
    sensitivity; removal uses disjoint windows so dropping one
    duplicated span never deletes tokens a neighboring clean span still
    owns, and a fully-clean doc reassembles byte-identical.

    Only FULL ``win_tokens``-token windows are removal candidates: a
    short tail window is a handful of tokens that collides across
    unrelated documents by chance (measured on the synthetic corpus),
    which is why Lee et al. impose a minimum duplicated-span length —
    tails always survive reassembly.

    Scale shape = dedup_lines' (curation.py): window explode shuffles
    md5 keys (32 bytes, not text) for the corpus-wide distinct-doc
    count; the hot set is tiny by construction (cross-doc duplicated
    text — MBs vs a TB corpus) and broadcasts back; reassembly is ONE
    per-doc aggregation of (idx, seg) structs — array_sort + filter +
    concat_ws, no window function."""
    stride = win_tokens
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_wins = F.greatest(
        F.lit(1).cast("long"), F.floor((n + stride - 1) / F.lit(float(stride)))
    )
    wins = (
        _spread(df, id_col)
        .select(
            id_col,
            toks.alias("__toks"),
            n.alias("__n"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_wins - 1)).alias("wi"),
        )
        .select(
            id_col,
            "wi",
            (F.col("wi") * stride + stride <= F.col("__n")).alias("is_full"),
            F.concat_ws(
                " ", F.slice("__toks", (F.col("wi") * stride + 1).cast("int"), stride)
            ).alias("seg"),
        )
        .withColumn("fp", F.md5("seg"))
    )
    # hot set from FULL windows only; a tail's fp can never equal a
    # full window's (different token counts → different text), so the
    # left join below is naturally tail-safe
    hot = (
        wins.filter("is_full")
        .groupBy("fp")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("fp", F.lit(True).alias("__hot"))
    )
    flagged = wins.join(F.broadcast(hot), "fp", "left").select(
        id_col, "wi", "seg", F.coalesce("__hot", F.lit(False)).alias("is_hot")
    )
    rows = F.array_sort(F.collect_list(F.struct("wi", "seg", "is_hot")))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum(F.col("is_hot").cast("long")).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(F.filter(rows, lambda s: ~s["is_hot"]), lambda s: s["seg"]),
        ).alias("text_clean"),
    )


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash over distinct tokens, md5-derived bits.

    bit_j(token) = bit (j%4) of hex digit (j//4) of md5(token); the
    doc's simhash sets bit j iff sum over tokens of (2*bit_j - 1) > 0.
    Pure integer expression tree → identical in Spark and DuckDB.
    """
    tok = df.select(
        id_col, F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w")
    ).withColumn("hx", F.md5(F.col("w")))
    # hex digit d (0-based) of the md5, as an int 0..15
    digit_val = lambda d: F.conv(F.substring("hx", 1 + d, 1), 16, 10).cast("int")  # noqa: E731
    aggs = []
    for j in range(16):
        d, b = j // 4, j % 4
        bit = F.shiftright(digit_val(d), b).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    sums = tok.groupBy(id_col).agg(*aggs)
    simhash = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return sums.select(id_col, simhash.cast("long").alias("simhash"))
