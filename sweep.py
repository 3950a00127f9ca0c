#!/usr/bin/env python
"""Full-catalog cross-SF differential sweep: every registered query's
Spark side vs its DuckDB oracle, one JSONL line per query (appended
incrementally, resumable — re-running skips names already recorded).

Usage:  python sweep.py [SF_DIR] [OUT_JSONL]
Defaults: /root/testdata/sf0.1, SWEEP_SF01.jsonl next to this file.

This is the 10x-assurance layer above the driver's per-round gate:
the driver verifies the 50-query window at sf0.01; tests verify all
queries at sf0.001; this sweep verifies the ENTIRE catalog at sf0.1
(first run: round 9 — `SWEEP_SF01_r09.jsonl`, 367/367 accounted for).

Known-super-linear ORACLES (engine sides all run fine at sf0.1) are
handled two ways:
- `geo_dbscan_grid` is pre-skipped: its recursive min-label closure is
  quadratic on the percolated sf0.1 cluster; its sf0.1 lane is the
  independent Python union-find replay recorded in SCALE.md round 9.
- anything else that exceeds ORACLE_TIMEOUT_S is interrupted and
  recorded `oracle-timeout` — round 9 saw exactly two (`er_resolve`,
  `graph_cc_incremental`, both percolated-closure shapes), and both
  were then verified exact by the same union-find replay device
  (pairs from the oracle's own cheap CTE prefix; clustering re-derived
  in plain Python; receipts in SCALE.md).
"""
import json
import math
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from a_share_data_pipeline_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "SWEEP_SF01.jsonl")
ORACLE_TIMEOUT_S = 150
# sf0.1-only: at sf0.001/sf0.01 the components are small and the
# recursive oracle is the driver-facing contract — run it there.
PRESKIP = (
    {
        "geo_dbscan_grid": (
            "recursive-closure oracle quadratic at sf0.1; independent "
            "union-find replay verified exact (SCALE.md round 9)"
        ),
    }
    if "sf0.1" in SF
    else {}
)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def canon(v):
    if v is None:
        return "~"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def main() -> None:
    spark = get_spark("sf-sweep")
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    def run_oracle(sql):
        timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
        timer.start()
        try:
            cur = con.execute(sql)
            return [d[0].lower() for d in cur.description], cur.fetchall()
        finally:
            timer.cancel()

    qs, oracles = E.queries(), E.oracle_sql()
    done = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = {json.loads(line)["name"] for line in f if line.strip()}

    out = open(OUT, "a", buffering=1)
    for name in sorted(qs):
        if name in done:
            continue
        rec = {"name": name}
        if name in PRESKIP:
            rec["status"], rec["why"] = "preskip", PRESKIP[name]
            out.write(json.dumps(rec) + "\n")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_s"] = round(time.time() - t0, 1)
            rec["rows"] = len(srows)
        except Exception as e:  # noqa: BLE001 — recorded, sweep continues
            rec["status"] = "spark-error"
            rec["why"] = f"{type(e).__name__}: {e}"[:300]
            out.write(json.dumps(rec) + "\n")
            continue
        if name not in oracles:
            rec["status"] = "rows-only"
            out.write(json.dumps(rec) + "\n")
            continue
        t0 = time.time()
        try:
            dcols, drows = run_oracle(oracles[name])
            rec["oracle_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            rec["status"] = (
                "oracle-timeout" if "INTERRUPT" in msg.upper() else "oracle-error"
            )
            rec["why"] = msg[:300]
            out.write(json.dumps(rec) + "\n")
            continue
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sc = sorted(tuple(canon(r[i]) for i in so) for r in srows)
        dc = sorted(tuple(canon(r[i]) for i in do) for r in drows)
        if sorted(scols) == sorted(dcols) and sc == dc:
            rec["status"] = "exact"
        else:
            rec["status"] = "MISMATCH"
            rec["why"] = {"cols": [sorted(scols), sorted(dcols)], "n": [len(sc), len(dc)]}
        out.write(json.dumps(rec) + "\n")
    print("SWEEP DONE")


if __name__ == "__main__":
    main()
