"""Contention-aware concurrent scheduling experiment (round 15).

VERDICT r14 task 1: stream count is saturated (24 optimal, 38.6 s best
observed) and the makespan trace shows the wall is the ~8 heavy queries
dilating 4-8x in-stream under 32-core contention. Two candidate fixes are
measured head-to-head against the committed baseline, on one warm session,
plus the instrumentation that decides whether ANY scheduling fix can reach
the ~35 s target:

1. **CPU-saturation instrumentation** — /proc/stat busy core-seconds
   across each pass. If busy/32 is already ~= the wall, the wall is
   compute-bound and no schedule beats total_work/32; the task's "or a
   committed analysis proving 32-core saturation bounds the wall" branch.
2. **Weighted-token scheduler** — every query carries a token weight
   ~ its sequential seconds (est. core demand); in-flight weight is capped
   at T tokens, so heavies run against BOUNDED light concurrency instead
   of 23 competitors. LPT order unchanged; work-conserving (lights fill
   whatever tokens heavies leave).
3. **Weighted FAIR pools** — heavies in a pool with weight 8: the
   executor-side version of the same idea (r11 tested only EQUAL-weight
   pools, which lose to more streams; weighted pools are the untested
   variant).

Writes experiments.conc_sched_r15 into BENCH_DETAIL.json (carried by
bench.py's experiment-preserving logic).

Run from the repo root ALONE (no concurrent pytest/bench):
    python tools/conc_sched_experiment.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.plans import workload
from execute_sync_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

POOL_XML = """<?xml version="1.0"?>
<allocations>
  <pool name="heavy"><schedulingMode>FAIR</schedulingMode><weight>8</weight><minShare>16</minShare></pool>
  <pool name="light"><schedulingMode>FAIR</schedulingMode><weight>1</weight><minShare>0</minShare></pool>
</allocations>
"""


def _cpu_busy() -> float:
    """System-wide busy core-seconds since boot (USER_HZ=100 assumed —
    Linux ABI constant for /proc/stat)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    return (sum(vals) - idle) / 100.0


class _TokenPool:
    """Counting semaphore with multi-token acquire: total in-flight weight
    <= tokens. Work-conserving — any waiter whose weight fits proceeds."""

    def __init__(self, tokens: int) -> None:
        self._n = tokens
        self._cv = threading.Condition()

    def acquire(self, w: int) -> None:
        with self._cv:
            while self._n < w:
                self._cv.wait()
            self._n -= w

    def release(self, w: int) -> None:
        with self._cv:
            self._n += w
            self._cv.notify_all()


def _weight(sec: float, cap: int, quant: float = 0.5) -> int:
    return max(1, min(cap, math.ceil(sec / quant)))


def run_pass(
    spark,
    order,
    seq_times,
    streams: int,
    tokens: int | None = None,
    cap: int = 16,
    pools: bool = False,
    heavy_thresh: float = 3.0,
) -> dict:
    pool = _TokenPool(tokens) if tokens else None
    t0 = time.perf_counter()
    busy0 = _cpu_busy()
    trace: dict[str, tuple[float, float]] = {}

    def _run(item):
        name, fn = item
        w = _weight(seq_times.get(name, 0.5), cap) if pool else 0
        if pool:
            pool.acquire(w)
        if pools:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool",
                "heavy" if seq_times.get(name, 0.0) >= heavy_thresh else "light",
            )
        s = time.perf_counter() - t0
        try:
            fn(spark, SF_DIR).collect()
        finally:
            if pool:
                pool.release(w)
            if pools:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
        trace[name] = (round(s, 3), round(time.perf_counter() - t0, 3))

    with ThreadPoolExecutor(max_workers=streams) as ex:
        list(ex.map(_run, order))
    wall = round(time.perf_counter() - t0, 3)
    busy = round(_cpu_busy() - busy0, 1)
    heavies = [n for n, _ in order if seq_times.get(n, 0.0) >= heavy_thresh]
    dil = {
        n: round((trace[n][1] - trace[n][0]) / seq_times[n], 2)
        for n in heavies
        if n in trace and seq_times.get(n)
    }
    gd = round(
        math.exp(sum(math.log(max(v, 1e-9)) for v in dil.values()) / len(dil)), 2
    ) if dil else None
    return {
        "wall_sec": wall,
        "cpu_busy_core_sec": busy,
        "cpu_utilization": round(busy / (NCPU * wall), 3),
        "heavy_dilation_geomean": gd,
        "heavy_dilation": dil,
    }


def main() -> None:
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    seq_times = detail.get("queries", {})

    pool_file = os.path.join(tempfile.gettempdir(), "ess_fair_pools.xml")
    with open(pool_file, "w") as f:
        f.write(POOL_XML)
    spark = get_spark(
        "conc_sched_experiment",
        extra_conf={"spark.scheduler.allocation.file": pool_file},
    )
    order = sorted(
        workload.QUERIES.items(), key=lambda kv: -seq_times.get(kv[0], 0.0)
    )

    results: dict = {"n_queries": len(order), "ncpu": NCPU}
    # discard one warm-up pass: codegen + page cache must not be charged
    # to the first measured config
    results["warmup_discarded"] = run_pass(spark, order, seq_times, 24)["wall_sec"]
    configs = [
        ("baseline_s24", dict(streams=24)),
        ("tokens_t48_c16_s32", dict(streams=32, tokens=48, cap=16)),
        ("tokens_t64_c16_s32", dict(streams=32, tokens=64, cap=16)),
        ("tokens_t40_c12_s32", dict(streams=32, tokens=40, cap=12)),
        ("fairpools_w8_s24", dict(streams=24, pools=True)),
        ("baseline_s24_rep", dict(streams=24)),
    ]
    for name, kw in configs:
        results[name] = run_pass(spark, order, seq_times, **kw)
        print(name, json.dumps(results[name]), flush=True)

    results["seq_total_ref"] = detail.get("seq_total_sec")
    results["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    detail.setdefault("experiments", {})["conc_sched_r15"] = results
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if isinstance(v, dict) and "wall_sec" in v}))


if __name__ == "__main__":
    main()
