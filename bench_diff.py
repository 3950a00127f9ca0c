#!/usr/bin/env python
"""Round-over-round bench diff: ``python bench_diff.py OLD.json NEW.json``.

Prints per-query deltas between two bench records, flagging each as
faster / slower / noise. Accepted shapes: the full record bench.py
writes to ``BENCH_DETAIL.json`` (has a ``queries`` map — the
round-over-round comparison input since round 7), legacy driver
``BENCH_r{N}.json`` records from rounds ≤6 (``{"parsed": {...}}`` or
raw, with a ``queries`` map), and round-7+ driver records only if
someone re-adds a map (they are compact by design — use the committed
``BENCH_DETAIL.json`` instead). The noise band is a flat ±15% —
local[32] rep-to-rep jitter measured across rounds; per-rep spread
lives in the record's ``detail`` blob for manual reading.

Two records are comparable ONLY if their versioned methodology labels
(``method_v`` — method + tmpfs substrate + canary protocol, written
by bench.py since r12; composed from the legacy fields for older
records) AND their scale factors match; the script banners loudly
when either differs, because round 5 proved a silent methodology
change reads as a fake ±17% regression (VERDICT r5 item 2/5) and the
scan canary + every per-query time scale with SF (ADVICE r11).
Totals are additionally gated on ``members_hash`` equality (VERDICT
r10 item 7): across a rotation, only the shared-subset delta is
meaningful. When both records carry the fixed ``canary`` pair (round
11+), the canary ratios are printed up front and the shared delta is
host-normalized on BOTH canary axes (iter = scheduler/CPU, scan =
IO/codegen — ADVICE r11: pick the axis matching the query class that
moved), separating code movement from host movement.
"""

from __future__ import annotations

import json
import sys

NOISE_BAND = 0.15  # fallback relative band when no per-rep spread is known


def _load(path: str) -> dict:
    with open(path) as f:
        rec = json.load(f)
    # driver wraps the parsed record; accept both shapes
    if isinstance(rec, dict) and isinstance(rec.get("parsed"), dict):
        rec = rec["parsed"]
    if not isinstance(rec, dict) or "queries" not in rec:
        raise SystemExit(f"{path}: no 'queries' map found (parsed: null record?)")
    return rec


def _effective_method(rec: dict) -> str:
    """Comparability key: the versioned methodology label (``method_v``,
    written by bench.py since r12 — VERDICT r11 item 7) plus the scale
    factor. Pre-r12 records carry no method_v, so it is composed here
    from the same ingredients (method + tmpfs substrate + canary
    protocol — ADVICE r10: the r10 tmpfs pin changed the substrate
    under the same 'xxhash64-full-gc1' label, so the r9→r10 headline
    delta silently mixed plan wins with substrate wins). The scan
    canary scales with SF, and every per-query time obviously does
    (ADVICE r11): records taken at different scale factors must refuse
    rather than print a misleading host ratio."""
    mv = rec.get("method_v")
    if mv is None:
        mv = (
            rec.get("method", "<unlabeled>")
            + ("+tmpfs" if rec.get("tmpfs") else "")
            + ("+canary2" if rec.get("canary") else "")
        )
    return f"{mv}@sf{rec.get('sf')}"


def diff(old: dict, new: dict) -> str:
    om, nm = _effective_method(old), _effective_method(new)
    lines = []
    if om != nm:
        lines.append(
            f"!! METHOD/SUBSTRATE MISMATCH: {om} vs {nm} — totals are NOT "
            "comparable; per-query deltas below are informational only"
        )
    oc, nc = old.get("canary"), new.get("canary")
    host = None
    if oc and nc:
        # host-movement estimate (VERDICT r10 item 2): the fixed canary
        # pair runs on byte-identical code every round, so its ratio IS
        # the host's movement; a query delta that matches the canary's
        # is host drift, not a plan change
        parts = []
        for k in ("iter", "scan"):
            a = min(oc.get(f"{k}_first", 1e9), oc.get(f"{k}_last", 1e9))
            b = min(nc.get(f"{k}_first", 1e9), nc.get(f"{k}_last", 1e9))
            if a < 1e9 and b < 1e9 and a > 0:
                parts.append((k, b / a))
        if parts:
            host = {k: r for k, r in parts}
            lines.append(
                "host canaries (fixed code; ratio new/old): "
                + ", ".join(f"{k} ×{r:.2f}" for k, r in parts)
                + " — per-query deltas tracking these ratios are host "
                "movement, not plan movement"
            )
        for rec, tag in ((oc, "old"), (nc, "new")):
            drift = [
                f"{k}: {rec.get(f'{k}_first')}→{rec.get(f'{k}_last')}s"
                for k in ("iter", "scan")
                if rec.get(f"{k}_first") is not None
            ]
            lines.append(f"  in-run canary ({tag}): " + "; ".join(drift))
    oq, nq = old["queries"], new["queries"]
    shared = [k for k in nq if k in oq]
    only_old = sorted(k for k in oq if k not in nq)
    only_new = sorted(k for k in nq if k not in oq)
    rows = []
    for k in shared:
        a, b = float(oq[k]), float(nq[k])
        d = b - a
        rel = d / a if a else float("inf")
        flag = "~" if abs(rel) <= NOISE_BAND else ("+" if d > 0 else "-")
        rows.append((d, f"{flag} {k:32s} {a:8.3f} -> {b:8.3f}  {d:+7.3f}s ({rel:+6.1%})"))
    rows.sort(key=lambda r: -abs(r[0]))
    lines += [r[1] for r in rows]
    st_o = sum(float(oq[k]) for k in shared)
    st_n = sum(float(nq[k]) for k in shared)
    rel_shared = (st_n - st_o) / st_o if st_o else float("inf")
    lines.append(
        f"shared {len(shared)} queries: {st_o:.3f}s -> {st_n:.3f}s "
        f"({rel_shared:+.1%}); "
        f"noise band ±{NOISE_BAND:.0%} ('~' rows are within it)"
    )
    if host:
        # code movement ≈ shared delta with the host's own movement
        # divided out. The canary pair spans TWO host axes (ADVICE
        # r11): the iter canary tracks scheduler/CPU movement (the
        # multi-job iterative class), the scan canary tracks IO/codegen
        # movement (map-only scans). Print both normalizations so a
        # reader picks the axis matching the query class that moved —
        # dividing scan-bound movement by the iter ratio would
        # mis-attribute it.
        for axis, note in (
            ("iter", "scheduler/CPU axis — iterative/multi-job queries"),
            ("scan", "IO/codegen axis — map-only scan queries"),
        ):
            if axis in host:
                lines.append(
                    f"host-normalized shared delta ({axis}-class): "
                    f"×{(1 + rel_shared) / host[axis]:.3f} "
                    f"(shared ×{1 + rel_shared:.3f} ÷ {axis} canary "
                    f"×{host[axis]:.3f}; {note})"
                )
    if only_old:
        lines.append(f"dropped from headline: {', '.join(only_old)}")
    if only_new:
        lines.append(f"new in headline: {', '.join(only_new)}")
    omh = old.get("members_hash", "<pre-r11>")
    nmh = new.get("members_hash", "<pre-r11>")
    # pre-r11 records carry no fingerprint — fall back to the queries
    # maps themselves so a cross-membership total can never print
    if omh != nmh or set(oq) != set(nq):
        lines.append(
            f"!! MEMBERSHIP MISMATCH ({omh} vs {nmh}): totals span different "
            "query sets and are NOT comparable (VERDICT r10 item 7) — use "
            "the shared-subset line above"
        )
    else:
        lines.append(
            f"totals (all queries): {old.get('value')}s ({len(oq)} q) -> "
            f"{new.get('value')}s ({len(nq)} q)"
        )
    return "\n".join(lines)


def _latest_stamped() -> list[str]:
    """The committed round-stamped quiet-machine records
    (``BENCH_DETAIL_r{NN}.json``), sorted by round. Preferred over the
    working-tree ``BENCH_DETAIL.json``, which the driver's (noisier,
    contended) per-round run overwrites — VERDICT r7 measured that
    overwrite as a uniform ~15% same-direction contention shift."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    paths = glob.glob(os.path.join(here, "BENCH_DETAIL_r*.json"))
    return sorted(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


if __name__ == "__main__":
    if len(sys.argv) == 1:
        stamped = _latest_stamped()
        if len(stamped) < 2:
            raise SystemExit(
                "need two BENCH_DETAIL_r*.json records for the no-arg mode; "
                "found: " + (", ".join(stamped) or "none") + "\n" + __doc__
            )
        a, b = stamped[-2], stamped[-1]
        print(f"# {a} -> {b} (round-stamped quiet-machine series)")
        print(diff(_load(a), _load(b)))
    elif len(sys.argv) == 3:
        print(diff(_load(sys.argv[1]), _load(sys.argv[2])))
    else:
        raise SystemExit(__doc__)
