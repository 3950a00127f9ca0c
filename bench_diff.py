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

Two records are comparable ONLY if their ``method`` labels match
(``xxhash64-full-gc1`` since round 5); the script refuses loudly when
they differ, because round 5 proved a silent methodology change reads
as a fake ±17% regression (VERDICT r5 item 2/5).
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


def diff(old: dict, new: dict) -> str:
    om, nm = old.get("method", "<unlabeled>"), new.get("method", "<unlabeled>")
    lines = []
    if om != nm:
        lines.append(
            f"!! METHOD MISMATCH: {om} vs {nm} — totals are NOT comparable; "
            "per-query deltas below are informational only"
        )
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
    lines.append(
        f"shared {len(shared)} queries: {st_o:.3f}s -> {st_n:.3f}s "
        f"({(st_n - st_o) / st_o:+.1%}); "
        f"noise band ±{NOISE_BAND:.0%} ('~' rows are within it)"
    )
    if only_old:
        lines.append(f"dropped from headline: {', '.join(only_old)}")
    if only_new:
        lines.append(f"new in headline: {', '.join(only_new)}")
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
