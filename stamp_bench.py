#!/usr/bin/env python
"""Canary-gated bench stamping (VERDICT r11 item 2): the rule that
turns "quietest window observed" from judgment into code.

Round 11 measured seven full runs of byte-identical headline code at
112.5-153.6s on a host with a ~10-minute stall cadence; the stamped
record was hand-picked as the quietest window. This script commits
that acceptance rule:

1. ``python stamp_bench.py log N`` — after each ``python bench.py``
   run, append the working-tree ``BENCH_DETAIL.json`` summary (total,
   canary pair, members_hash, method_v) to ``BENCH_RUNS_r{N}.jsonl``.
   The runs file is the round's full series — every run, not just the
   flattering ones — and is committed as the stamping receipt.
2. ``python stamp_bench.py stamp N`` — copy ``BENCH_DETAIL.json`` to
   ``BENCH_DETAIL_r{N}.json`` ONLY if every gate passes; otherwise
   refuse, print the failing gates, and exit 1 (rerun bench on a
   quieter window instead).

Gates (``accept()`` — pure, pinned by tests/test_scale_ops.py):

- **canary floor**: min(iter_first, iter_last) ≤ ITER_FLOOR × TOL and
  min(scan_first, scan_last) ≤ SCAN_FLOOR × TOL. The floors are the
  best readings observed across round 11's seven-run series on this
  host class (iter 1.72s from the driver's own r11 record, scan 0.41s
  from the r11 stamp); a window whose canaries cannot reach within
  TOL of those floors is a stalled host, and per-query deltas taken
  from it are host movement. Re-base the floors ONLY with a committed
  receipt (a multi-run series on the new host class) — never to make
  one stamp pass.
- **series minimum**: the candidate's total must be ≤ 1.01 × the
  minimum total among the round's logged runs with the same
  members_hash + method_v (a mid-run stall can inflate the total while
  both canary ends read clean — the r11 extended series recorded a
  +75.7% run with clean canaries; only the series minimum defends
  against that).
- **shape**: the record must carry the canary pair, members_hash and
  method_v at the expected sf (0.1 — the driver's bench SF).
- **receipt completeness** (ADVICE r12): the candidate run itself must
  appear in the logged series (matched on value + members_hash +
  method_v + canary). A run that was never ``log``-ged cannot be
  stamped, so the committed BENCH_RUNS receipt provably contains the
  stamped run and can never be silently thinned.

``--extended`` stamps BENCH_DETAIL_EXTENDED.json →
BENCH_DETAIL_EXTENDED_r{N}.json against BENCH_RUNS_EXTENDED_r{N}.jsonl
with the same gates.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

# Committed canary floors (see module docstring for provenance and the
# re-basing rule) and the acceptance tolerances.
ITER_FLOOR = 1.72
SCAN_FLOOR = 0.41
CANARY_TOL = 1.25  # a canary min more than 25% over floor = stalled host
TOTAL_TOL = 1.01   # stamped total must be the series minimum (±1%)
EXPECTED_SF = 0.1


def _same_run(a: dict, b: dict) -> bool:
    """Two records describe the same bench run (receipt-completeness
    identity: total + membership + methodology + the canary pair)."""
    return all(
        a.get(k) == b.get(k)
        for k in ("value", "members_hash", "method_v", "canary")
    )


def _canary_min(canary: dict, axis: str) -> float | None:
    vals = [
        canary[k]
        for k in (f"{axis}_first", f"{axis}_last")
        if isinstance(canary.get(k), (int, float))
    ]
    return min(vals) if vals else None


def accept(record: dict, logged: list[dict]) -> list[str]:
    """Gate check: [] = stamp it; otherwise the list of failures."""
    fails: list[str] = []
    canary = record.get("canary") or {}
    if record.get("sf") != EXPECTED_SF:
        fails.append(f"sf={record.get('sf')} != expected {EXPECTED_SF}")
    for field in ("members_hash", "method_v"):
        if not record.get(field):
            fails.append(f"record missing {field}")
    for axis, floor in (("iter", ITER_FLOOR), ("scan", SCAN_FLOOR)):
        got = _canary_min(canary, axis)
        if got is None:
            fails.append(f"no {axis} canary readings in record")
        elif got > floor * CANARY_TOL:
            fails.append(
                f"{axis} canary min {got:.3f}s > floor {floor:.2f}s "
                f"× {CANARY_TOL:.2f} = {floor * CANARY_TOL:.3f}s — stalled host"
            )
    peers = [
        r
        for r in logged
        if r.get("members_hash") == record.get("members_hash")
        and r.get("method_v") == record.get("method_v")
        and isinstance(r.get("value"), (int, float))
    ]
    if not peers:
        fails.append(
            "no logged runs with matching members_hash+method_v in the "
            "round's BENCH_RUNS series — run `stamp_bench.py log N` after "
            "each bench run first"
        )
    else:
        series_min = min(r["value"] for r in peers)
        if record.get("value", float("inf")) > series_min * TOTAL_TOL:
            fails.append(
                f"total {record.get('value')}s > series minimum "
                f"{series_min}s × {TOTAL_TOL} — a quieter window was "
                "already observed this round; stamp that one (or rerun)"
            )
        if not any(_same_run(r, record) for r in peers):
            fails.append(
                "candidate run missing from the logged BENCH_RUNS series "
                "— `stamp_bench.py log N` every run before stamping (the "
                "committed receipt must provably contain the stamped run)"
            )
    return fails


def _summary(record: dict) -> dict:
    return {
        "value": record.get("value"),
        "n_queries": record.get("n_queries", len(record.get("queries", {}))),
        "sf": record.get("sf"),
        "method_v": record.get("method_v"),
        "members_hash": record.get("members_hash"),
        "canary": record.get("canary"),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--extended"]
    extended = "--extended" in sys.argv[1:]
    if len(args) != 2 or args[0] not in ("log", "stamp"):
        raise SystemExit(__doc__)
    cmd, rnd = args[0], int(args[1])
    here = os.path.dirname(os.path.abspath(__file__))
    tag = "_EXTENDED" if extended else ""
    detail = os.path.join(here, f"BENCH_DETAIL{tag}.json")
    runs = os.path.join(here, f"BENCH_RUNS{tag}_r{rnd}.jsonl")
    with open(detail) as f:
        record = json.load(f)
    if cmd == "log":
        with open(runs, "a") as f:
            f.write(json.dumps(_summary(record)) + "\n")
        print(f"logged run #{sum(1 for _ in open(runs))}: "
              f"total={record.get('value')}s canary={record.get('canary')}")
        return
    logged = (
        [json.loads(l) for l in open(runs) if l.strip()]
        if os.path.exists(runs)
        else []
    )
    fails = accept(record, logged)
    if fails:
        print("REFUSED — gates failed:")
        for f_ in fails:
            print(f"  - {f_}")
        raise SystemExit(1)
    dst = os.path.join(here, f"BENCH_DETAIL{tag}_r{rnd:02d}.json")
    shutil.copyfile(detail, dst)
    print(
        f"stamped {os.path.basename(dst)}: total={record['value']}s "
        f"canary={record['canary']} ({len(logged)} runs logged this round)"
    )


if __name__ == "__main__":
    main()
