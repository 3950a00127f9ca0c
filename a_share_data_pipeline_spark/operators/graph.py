"""Connected components over a pair graph (dedup clustering).

Near-dup pipelines end with "group the pairs into clusters, keep one
canonical doc per cluster" — that grouping is connected components on
the candidate-pair graph. The reference has nothing iterative
(SURVEY.md §3: three linear flows), so this is a pure [GAP] capability;
it is also the one operator family here that genuinely cannot be a
single Catalyst plan and needs a driver-side fixed-point loop.

Scale design:
- the loop runs ONLY over nodes that appear in an edge: in a deduped
  corpus the overwhelming majority of docs are singletons whose label
  cannot change, so every per-round join/aggregate AND per-round
  label checkpoint is sized by the pair graph, not the corpus (the
  previous shape re-materialized a corpus-sized label frame every
  round — the actual 100 TB killer); singletons rejoin as their own
  component in one anti-join at the end. At bench scale this trades
  ~0.5s of fixed extra jobs (distinct + anti-join + union) for the
  asymptotic win — measured interleaved A/B at sf0.1: restricted
  5.08s mean vs corpus-wide 6.09s mean (4.61 vs 4.07 steady-state
  min),
- each iteration is one shuffle (edge⋈label join + min-aggregate);
  label state is `localCheckpoint`ed every round so the plan/lineage
  does not grow with the iteration count (the classic iterative-Spark
  failure mode),
- min-label propagation converges in O(diameter) rounds; dedup
  clusters are near-cliques (diameter ≤ ~3), so 3-5 rounds finish.
  For adversarial long-chain graphs switch `fold_edges=True`, which
  additionally rewrites each edge endpoint to its current label
  (pointer-doubling-style contraction, O(log n) rounds on chains).
  Measured rule of thumb (r9, sf0.1): fold pays ONLY when diameter
  is large (geo percolation chains — required there, the plain loop
  would exceed max_iters); on hub-dominated small-diameter graphs
  the per-round contraction (two joins + distinct + re-symmetrize)
  costs more than it saves — the 587k-edge bipartite co-purchase
  graph benched 3.3-3.6s plain vs 3.8-4.2s folded, so
  graph_cc_incremental/er_resolve/dedup stay fold-free,
- convergence is detected with a count of changed labels — one extra
  cheap action per round on an already-checkpointed frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pagerank/personalized_pagerank: cut the single-use rank chain's
# lineage every N unrolled rounds. Small fixed iteration counts (the
# catalog's 3) pipeline as one checkpoint-free job; a caller-supplied
# large ``iters`` no longer builds a join tower whose Catalyst
# analysis cost grows superlinearly with depth.
_CHECKPOINT_EVERY = 8


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iters: int = 25,
    fold_edges: bool = False,
) -> DataFrame:
    """(id, component) for every node; component = min reachable node id.

    ``nodes``: one column `id_col` (isolated nodes keep their own id as
    component). ``edges``: columns (a, b), undirected, any orientation;
    endpoints outside ``nodes`` are DROPPED along with the edges through
    them (enforced below), so the output is always keyed exactly by the
    ``nodes`` input and connectivity never flows through an unknown node.
    """
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    sym = sym.localCheckpoint(eager=True)
    # iterate ONLY over nodes that appear in an edge: in a deduped
    # corpus the overwhelming majority of nodes are singletons whose
    # label can never change — keeping them out shrinks every per-round
    # join/aggregate to the pair-graph's node set; they rejoin as their
    # own component at the end.
    #
    # endpoints ⊆ nodes is enforced AT LABEL INIT, not by rewriting
    # sym: labels = (edge endpoints ∩ nodes), so a stray endpoint never
    # acquires a label — the per-round inner join on src drops edges
    # OUT of a stray node, and the left join back onto labels discards
    # propagation INTO one, so an edge with a stray endpoint disappears
    # entirely and its valid endpoint stays a singleton. This costs one
    # map-only broadcast semi-join folded into the labels init that was
    # already checkpointed (the distinct endpoint set is
    # pair-graph-sized; the nodes frame is scanned once, never
    # shuffled) — versus the previous shape's two extra eager sym
    # checkpoints + two broadcast joins over the full edge list, which
    # benched at +0.8s fixed cost (dedup_components 3.38→4.15s).
    edge_nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = (
        nodes.select(F.col(id_col).alias("node"))
        .join(F.broadcast(edge_nodes), "node", "left_semi")
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        # neighbor minimum: join edge source to its label, aggregate per dst
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select("node", F.least("lbl", "nbr_lbl").alias("lbl"), F.col("lbl").alias("old"))
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("lbl") < F.col("old")).limit(1).count()
        labels = new_labels.select("node", "lbl")
        if changed == 0:
            break
        if fold_edges:
            # contract: re-point both edge endpoints at current labels
            # (shortcuts long chains, pointer-doubling style), and keep a
            # "star" edge node↔label for every relabeled node — without
            # it, contracted-away nodes stop receiving updates and end
            # with a stale intermediate label
            la = labels.select(F.col("node").alias("src"), F.col("lbl").alias("sa"))
            lb = labels.select(F.col("node").alias("dst"), F.col("lbl").alias("sb"))
            contracted = (
                sym.join(la, "src")
                .join(lb, "dst")
                .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
            )
            star = labels.filter(F.col("node") != F.col("lbl")).select(
                F.col("node").alias("src"), F.col("lbl").alias("dst")
            )
            half = (
                contracted.unionByName(star)
                .filter(F.col("src") != F.col("dst"))
                .distinct()
            )
            sym = half.unionByName(
                half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).localCheckpoint(eager=True)
    # anti-join against the CHECKPOINTED labels (same node set as
    # edge_nodes) so the final job reads materialized blocks instead of
    # recomputing the distinct
    singletons = nodes.select(F.col(id_col).alias("node")).join(
        labels.select("node"), "node", "left_anti"
    )
    return labels.unionByName(
        singletons.select("node", F.col("node").alias("lbl"))
    ).select(F.col("node").alias(id_col), F.col("lbl").alias("component"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst), fixed iteration
    count, ranks rounded to ``round_to`` decimals EVERY round.

    The per-round rounding is part of the operator contract, not
    cosmetics: it re-synchronizes float state across engines (the
    DuckDB oracle unrolls the same rounds as CTEs) and across shuffle
    reorderings of the in-edge sums, exactly like the unrolled-Lloyd
    k-means oracle. Convergence is unaffected at 1e-6 granularity.

    Scale design (revised round 5 after the bench showed per-round
    eager localCheckpoints DEGRADING across reps — 9.1s → 18.0s as
    checkpointed RDD blocks accumulated; the fix is to need no
    per-round materialization at all):
    - the rank state is SINGLE-USE per round: out-degrees ride on the
      EDGES (``edges_w``: src, dst, outdeg — checkpointed once), and
      the dangling-node left join reads a STATIC (node, outdeg) frame
      (checkpointed once). Each round is then one join (ranks onto
      weighted edges) + one aggregate (sum by dst) + one left join
      onto the static node frame — O(E) shuffled bytes per round —
      and because ranks_i feeds ranks_{i+1} exactly once, lineage is
      a simple chain: no recompute fan-out, no per-round checkpoint,
      the whole unrolled iteration runs as ONE job with full stage
      pipelining. (connected_components keeps per-round checkpoints
      because its round count is data-dependent and its state is
      multi-use; a fixed small iteration count does not need them.
      For large ``iters`` the loop cuts lineage every
      ``_CHECKPOINT_EVERY`` rounds — without the guard the unrolled
      join tower's Catalyst analysis cost grows superlinearly with
      caller-supplied ``iters``; with it, plan depth is bounded while
      small-iters callers still pay zero checkpoints.)
    - the simple-citation formulation r' = (1-d) + d·Σ r/outdeg is
      used (no dangling-mass redistribution): sinks absorb rank,
      sources hold (1-d) — deterministic and oracle-matched; the
      contribution divides rank/outdeg PER EDGE, the same expression
      the oracle's unrolled CTEs evaluate.
    """
    from ..functions.rounding import dround

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # static frames, each consumed once per round: materialize once
    nodes_od = (
        nodes.join(outdeg, "node", "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    edges_w = (
        edges.join(outdeg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    ranks = nodes_od.select("node", F.lit(1.0).alias("rank"))
    for i in range(iters):
        inflow = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes_od.join(inflow, "node", "left")
            .select(
                "node",
                dround(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)),
                    round_to,
                ).alias("rank"),
            )
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[str],
    damping: float = 0.85,
    iters: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Personalized PageRank: teleport mass lands ONLY on ``seeds``
    (r' = (1-d)·1[seed] + d·Σ r/outdeg; r0 = the teleport vector), so
    rank concentrates in the seeds' neighborhoods — the recommendation
    / similarity-expansion variant of :func:`pagerank`. Unnormalized
    teleport (1 per seed, not 1/|S|) — deterministic and mirrored in
    the oracle; relative ordering is unaffected.

    Same scale shape as pagerank: single-use rank chain over the two
    checkpointed static frames, no per-round materialization. Seeds
    enter as literals (an isin over the node column) — the seed SET
    is query-scoped and small by definition; seeds absent from the
    graph contribute nothing on either engine.
    """
    from ..functions.rounding import dround

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    nodes_od = (
        nodes.join(outdeg, "node", "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    edges_w = (
        edges.join(outdeg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    base = F.when(F.col("node").isin(*seeds), F.lit(1.0 - damping)).otherwise(
        F.lit(0.0)
    )
    seed_one = F.when(F.col("node").isin(*seeds), F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes_od.select("node", seed_one.alias("rank"))
    for i in range(iters):
        inflow = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes_od.join(inflow, "node", "left").select(
            "node",
            dround(
                base + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)),
                round_to,
            ).alias("rank"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def _symmetrize(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Undirected view of a directed edge list: both orientations,
    materialized once (multi-use across iteration rounds).

    ``dedup=False`` skips the distinct — a full 2E shuffle — for
    callers that can PROVE the mirror cannot collide: the input is
    already distinct AND no reverse pair exists (e.g. a bipartite
    graph whose two sides use disjoint id ranges, like the
    customer-even / supplier-odd purchase graph). Neighbor-count
    semantics (LPA) and min-relaxation (BFS) are both correct only
    if the edge multiset is duplicate-free, so the flag is a
    caller-supplied proof, not a tolerance."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if dedup:
        sym = sym.distinct()
    return sym.localCheckpoint(eager=True)


def label_propagation(
    edges: DataFrame, iters: int = 3, edges_dedup: bool = True
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over an UNDIRECTED edge list: every node starts with its
    own id as label; each round every node adopts the most frequent
    label among its neighbors, ties broken by the LARGEST label — a
    deterministic variant (classic LPA tie-breaks randomly; a random
    tie-break cannot be oracle-verified and is irreproducible across
    cluster sizes). Fixed ``iters`` rounds, no convergence test, so
    the unrolled plan matches the oracle's unrolled CTEs exactly.

    Node ids MUST be non-negative BIGINTs below 2**33 — at corpus
    scale you dictionary-encode string entity keys to dense ints
    before any iterative graph work anyway (shuffling int64 pairs
    instead of strings roughly halves every round's shuffle bytes).
    The constraint exists because the per-node argmax packs
    (count, label) into ONE bigint — ``cnt * 2**33 + lbl`` — so the
    round reduces with a plain max() that stays inside
    HashAggregate with map-side partial aggregation. The first
    version used max(struct(cnt, lbl)) over string labels: struct
    and string aggregation buffers are not hash-aggregable, so
    every round fell back to SortAggregate (full sort of the E-sized
    count frame; measured 8-12s vs ~4s for the 3-round sf0.1 query),
    exactly like a row_number window would.

    Scale shape: each round is one O(E) join (labels onto edges) +
    one partial-aggregated count shuffle keyed on (node, label) +
    one hash-aggregated per-node max. Label state is a single-use
    chain like pagerank's rank state — no per-round materialization,
    lineage cut every _CHECKPOINT_EVERY rounds for large caller-
    supplied ``iters``. Communities differ from connected_components:
    CC merges everything reachable; LPA keeps densely-connected
    cores separate when a bridge node's neighbor majority points
    elsewhere."""
    shift = F.lit(2**33)
    sym = _symmetrize(edges, dedup=edges_dedup)
    # loud preconditions for the packed argmax (silent violations
    # would return wrong communities, not errors): labels live in the
    # low 33 bits, counts in the high bits — so ids must sit in
    # [0, 2^33) and no neighbor-label count may reach 2^30
    node_raw = F.col("src")
    node_ok = F.when(
        (node_raw < 0) | (node_raw >= 2**33),
        F.raise_error(
            F.lit("label_propagation: node ids must be bigints in [0, 2**33)")
        ).cast("long"),
    ).otherwise(node_raw)
    labels = (
        sym.select(node_ok.alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for i in range(iters):
        nbr = sym.join(labels, sym["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "lbl"
        )
        cnt_raw = F.count(F.lit(1))
        cnt_ok = F.when(
            cnt_raw >= 2**30,
            F.raise_error(
                F.lit("label_propagation: neighbor-label count >= 2**30 "
                      "overflows the packed argmax")
            ).cast("long"),
        ).otherwise(cnt_raw)
        cnt = nbr.groupBy("node", "lbl").agg(cnt_ok.alias("cnt"))
        labels = (
            cnt.groupBy("node")
            .agg(F.max(F.col("cnt") * shift + F.col("lbl")).alias("key"))
            .select("node", F.pmod(F.col("key"), shift).alias("lbl"))
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and (i + 1) < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels


def bfs_hops(
    edges: DataFrame,
    seeds: list[str],
    max_hops: int = 3,
    edges_dedup: bool = True,
) -> DataFrame:
    """Multi-source BFS hop distance over an UNDIRECTED edge list:
    ``hops`` = length of the shortest path from any seed, up to
    ``max_hops`` rounds; unreached nodes are dropped from the output
    (at scale that is the point — k rounds from a small seed set touch
    a local ball, the unreachable tail never materializes a row).

    Each round relaxes every edge once: one O(E) join of the current
    distance frame onto the symmetric edges, one min-aggregate per
    destination, one left join back onto the (node, dist) state — the
    dense Bellman-Ford-style relaxation (frontier-only would shuffle
    less per round but needs a data-dependent stopping test; a fixed
    small round count keeps the plan static and oracle-unrollable).
    The NULL handling is explicit (CASE, not LEAST) because engines
    disagree on LEAST's null semantics."""
    sym = _symmetrize(edges, dedup=edges_dedup)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    dist = nodes.select(
        "node",
        F.when(F.col("node").isin(*seeds), F.lit(0))
        .otherwise(F.lit(None))
        .cast("int")
        .alias("hops"),
    )
    for i in range(max_hops):
        relax = (
            sym.join(
                dist.filter(F.col("hops").isNotNull()),
                sym["src"] == dist["node"],
            )
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("cand"))
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        dist = dist.join(relax, "node", "left").select(
            "node",
            F.when(F.col("hops").isNull(), F.col("cand"))
            .when(F.col("cand").isNull(), F.col("hops"))
            .otherwise(F.least("hops", "cand"))
            .cast("int")
            .alias("hops"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and (i + 1) < max_hops:
            dist = dist.localCheckpoint(eager=True)
    return dist.filter(F.col("hops").isNotNull())

def sssp(
    edges: DataFrame,
    seeds: list,
    max_rounds: int = 3,
    edges_dedup: bool = True,
) -> DataFrame:
    """Weighted multi-source shortest-path distance (bounded
    Bellman-Ford) over an UNDIRECTED weighted edge list (src, dst, w):
    ``dist`` = minimum total edge weight from any seed along paths of
    at most ``max_rounds`` edges; unreached nodes are dropped (the
    :func:`bfs_hops` scale argument — k rounds from a small seed set
    touch a local ball, the unreachable tail never materializes).

    The weighted generalization of :func:`bfs_hops`: each round
    relaxes every edge once (one O(E) join of the reachable frontier
    onto the symmetric edges, one min-aggregate per destination, one
    left join back onto the (node, dist) state); ``cand = dist + w``
    instead of ``hops + 1``. Weights must be non-negative — bounded
    Bellman-Ford is still *correct* for negative weights within the
    round budget, but "shortest within k hops" stops being a useful
    distance there. Integer weights keep both engines bit-exact with
    nothing to round.

    ``edges_dedup=False`` is the caller's proof that the mirrored
    edge multiset is already duplicate-free (see ``_symmetrize``);
    parallel edges with DIFFERENT weights are always legal — the
    min-aggregate keeps the cheapest — it is only exact duplicate
    orientations that would be double-counted by LPA-style callers
    (min-relaxation itself is idempotent, so even those are harmless
    here; the flag just skips a full 2E shuffle)."""
    sym = edges.select("src", "dst", "w").unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
        )
    )
    if edges_dedup:
        sym = sym.groupBy("src", "dst").agg(F.min("w").alias("w"))
    sym = sym.localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    dist = nodes.select(
        "node",
        F.when(F.col("node").isin(*seeds), F.lit(0))
        .otherwise(F.lit(None))
        .cast("bigint")
        .alias("dist"),
    )
    for i in range(max_rounds):
        relax = (
            sym.join(
                dist.filter(F.col("dist").isNotNull()),
                sym["src"] == dist["node"],
            )
            .select(
                F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("cand")
            )
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        dist = dist.join(relax, "node", "left").select(
            "node",
            F.when(F.col("dist").isNull(), F.col("cand"))
            .when(F.col("cand").isNull(), F.col("dist"))
            .otherwise(F.least("dist", "cand"))
            .cast("bigint")
            .alias("dist"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and (i + 1) < max_rounds:
            dist = dist.localCheckpoint(eager=True)
    return dist.filter(F.col("dist").isNotNull())
