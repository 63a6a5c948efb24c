"""Concurrency-scaling experiment for the throughput pass (round 11).

Question: after the FAIR-pool-per-query fix, the 8-stream wall is still
~2.9x the seq/8 ideal — is the residual SCHEDULER-bound (pools / stream
count would move it) or DRIVER-bound (PySpark's single-GIL job submission
+ per-query planning is the floor)? The VERDICT r10 task 3 close-out
requires an artifact either way.

Method: run the full workload's concurrent pass under four configs —
streams 4 / 8 / 16 with per-query pools, and streams 8 WITHOUT pools
(everything in the FIFO default pool) — on one warm session, and record
the walls. If the three pooled walls are flat and pools-off is not much
worse, the wall is driver-bound (Amdahl floor: per-query driver work is
serialized on the GIL regardless of executor-side sharing); if pools-off
degrades badly and streams matter, it is scheduler-bound.

Writes results into BENCH_DETAIL.json under experiments.conc_scaling_r11
(the carry logic preserves experiment blocks across later bench runs).

Run from the repo root: python tools/conc_experiment.py

RESULT (2026-08-15, sf0.1, 148 queries, local[32]): pools lose the
head-to-head (36.3 s pooled vs 33.4 s unpooled at 8 streams); stream
count is the lever (45.2 / 36.3 / 26.9-27.2 / 24.3-26.5 s at
4 / 8 / 16 / 24-32 streams, ±15% session noise above 16). Conclusion:
the wall is per-job-latency-bound, fixed by MORE in-flight jobs, with a
driver-side (GIL) floor around ~25 s — bench.py now defaults to 24
plain FIFO streams with no pool assignment, and the FIFO-inside-FAIR
theory is withdrawn in ROADMAP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.session import get_spark
from execute_sync_spark.plans import workload

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def conc_pass(spark, streams: int, pools: bool, order) -> float:
    def _run(item):
        name, fn = item
        if pools:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        try:
            fn(spark, SF_DIR).collect()
        finally:
            if pools:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=streams) as ex:
        list(ex.map(_run, order))
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    times = detail.get("queries", {})

    spark = get_spark()
    # LPT order from the last committed sequential pass, like bench.py
    order = sorted(
        workload.QUERIES.items(), key=lambda kv: -times.get(kv[0], 0.0)
    )
    # one warm-up pass result is discarded: the first concurrent pass pays
    # codegen + page-cache warming that the comparison must not attribute
    # to its config
    warmup = conc_pass(spark, 8, True, order)
    results = {"warmup_discarded": warmup}
    for streams, pools in ((4, True), (8, True), (16, True), (8, False)):
        key = f"streams{streams}_{'pools' if pools else 'nopools'}"
        results[key] = conc_pass(spark, streams, pools, order)
        print(key, results[key], flush=True)

    results["seq_total_ref"] = detail.get("seq_total_sec")
    results["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    detail.setdefault("experiments", {})["conc_scaling_r11"] = results
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
