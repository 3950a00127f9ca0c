"""Host-stall receipt logger (VERDICT r11 item 5).

Round 11 documented a ~10-minute-cadence host stall cycle: seven runs
of byte-identical bench code read 112.5-153.6s and the fixed iterative
canary's first reading ranged 1.90-13.65s. This probe separates the
two remaining hypotheses WITHOUT any engine code:

- external (noisy co-tenant / hypervisor steal / cgroup throttling):
  the pure-Python fixed workload stalls in sync with kernel counters
  (steal ticks, cpu.stat throttled_usec) while nothing runs locally;
- local (pytest residue, page cache, JVM): the fixed workload is flat
  when no engine process runs, and only bench/pytest sessions stall.

Every ~10s it appends one JSON line to HOST_PROBE_r{N}.jsonl with:

- ``work_s``: wall seconds for a fixed single-thread CPU workload
  (sum of 2M int multiplications — no allocation churn, no IO). On a
  quiet host this is constant to ~±3%; a >25% excursion is a stall.
- ``cpu``: the /proc/stat aggregate cpu line deltas since the last
  sample (user/nice/system/idle/iowait/irq/softirq/steal) in ticks —
  ``steal`` is the hypervisor-contention axis.
- ``throttle``: cgroup-v2 cpu.stat counters (nr_throttled,
  throttled_usec deltas) — the quota-throttling axis.
- ``load1``: 1-minute loadavg, ``procs_running`` from /proc/stat.

Usage: ``python host_probe.py OUT.jsonl [duration_s]`` (default 7200).
Analysis: ``python host_probe.py --report OUT.jsonl`` prints the
excursion table (work_s > 1.25 * median) with the kernel-counter
state during each excursion, i.e. the one-page receipt SCALE.md needs.
"""
from __future__ import annotations

import json
import os
import sys
import time


def _read_proc_stat() -> tuple[dict[str, int], int]:
    cpu: dict[str, int] = {}
    procs_running = 0
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu "):
                vals = [int(x) for x in line.split()[1:]]
                keys = ["user", "nice", "system", "idle", "iowait",
                        "irq", "softirq", "steal"]
                cpu = dict(zip(keys, vals))
            elif line.startswith("procs_running"):
                procs_running = int(line.split()[1])
    return cpu, procs_running


def _read_throttle() -> dict[str, int]:
    # cgroup v2 first, v1 fallback; absent keys just stay zero.
    for path in ("/sys/fs/cgroup/cpu.stat",
                 "/sys/fs/cgroup/cpu/cpu.stat"):
        try:
            with open(path) as f:
                d = {}
                for line in f:
                    k, _, v = line.partition(" ")
                    if k in ("nr_throttled", "throttled_usec",
                             "throttled_time", "nr_periods"):
                        d[k] = int(v)
                return d
        except OSError:
            continue
    return {}


def _work() -> float:
    """Fixed CPU workload: ~2M integer multiply-adds, single thread."""
    t0 = time.perf_counter()
    acc = 1
    for i in range(2_000_000):
        acc = (acc * 31 + i) & 0xFFFFFFFF
    dt = time.perf_counter() - t0
    assert acc >= 0
    return dt


def probe(out_path: str, duration_s: float) -> None:
    t_end = time.time() + duration_s
    prev_cpu, _ = _read_proc_stat()
    prev_thr = _read_throttle()
    with open(out_path, "a") as out:
        while time.time() < t_end:
            work_s = _work()
            cpu, procs_running = _read_proc_stat()
            thr = _read_throttle()
            with open("/proc/loadavg") as f:
                load1 = float(f.read().split()[0])
            rec = {
                "t": round(time.time(), 1),
                "work_s": round(work_s, 4),
                "cpu": {k: cpu[k] - prev_cpu.get(k, 0) for k in cpu},
                "throttle": {k: thr[k] - prev_thr.get(k, 0) for k in thr},
                "load1": load1,
                "procs_running": procs_running,
            }
            prev_cpu, prev_thr = cpu, thr
            out.write(json.dumps(rec) + "\n")
            out.flush()
            time.sleep(10)


def report(path: str) -> None:
    recs = [json.loads(l) for l in open(path) if l.strip()]
    if not recs:
        print("empty probe file")
        return
    works = sorted(r["work_s"] for r in recs)
    med = works[len(works) // 2]
    span_min = (recs[-1]["t"] - recs[0]["t"]) / 60
    print(f"samples={len(recs)} span={span_min:.1f}min "
          f"work_s median={med:.3f} min={works[0]:.3f} max={works[-1]:.3f}")
    exc = [r for r in recs if r["work_s"] > 1.25 * med]
    print(f"excursions (>25% over median): {len(exc)}")
    for r in exc:
        c = r["cpu"]
        busy = sum(v for k, v in c.items() if k not in ("idle", "iowait"))
        total = busy + c.get("idle", 0) + c.get("iowait", 0)
        print(
            f"  t+{(r['t'] - recs[0]['t']) / 60:6.1f}min work={r['work_s']:.3f}s "
            f"steal={c.get('steal', 0)} busy%={100 * busy / max(total, 1):.0f} "
            f"throttled_usec={r['throttle'].get('throttled_usec', 0)} "
            f"load1={r['load1']} procs_running={r['procs_running']}"
        )
    # cadence estimate: gaps between excursion starts
    if len(exc) >= 2:
        gaps = [(b["t"] - a["t"]) / 60 for a, b in zip(exc, exc[1:])
                if b["t"] - a["t"] > 60]
        if gaps:
            print(f"excursion gaps (min): {[round(g, 1) for g in gaps]}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    if sys.argv[1] == "--report":
        if len(sys.argv) < 3 or not os.path.exists(sys.argv[2]):
            raise SystemExit(
                "--report needs an existing samples file\n" + (__doc__ or "")
            )
        report(sys.argv[2])
    else:
        probe(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 7200.0)
