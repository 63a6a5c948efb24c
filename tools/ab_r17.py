"""Round-17 paired A/B harness for labeled materialization sites.

Times named queries with a set of matpoint sites ENABLED (the round-16
HEAD behavior) vs DISABLED (the lazy/pre-r16 behavior), interleaved
A/B/B/A within each run so slow host drift cancels, and reports per-query
medians + ratios. Both variants produce identical results by construction
(the sites only change materialization, never semantics); this harness is
how each site's shipped default was chosen.

Usage:
    python tools/ab_r17.py --queries dedup_lsh_recall,graph_doc_pagerank \
        --sites lsh_recall_shingles,pagerank_edges [--runs 5] [--json out]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.functions import matpoint
from execute_sync_spark.session import get_spark
from execute_sync_spark.plans import workload


def _time_query(spark, sf_dir, name, fn):
    spark.sparkContext.setJobDescription(f"ab_r17:{name}")
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sites", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    names = args.queries.split(",")
    # a site of the form "attr:module.path.ATTR" flips a module-level bool
    # (True in the "on" variant, False in "off") instead of a mat site
    raw_sites = args.sites.split(",")
    sites = {s for s in raw_sites if not s.startswith("attr:")}
    attrs = []
    for s in raw_sites:
        if s.startswith("attr:"):
            modpath, attr = s[5:].rsplit(".", 1)
            import importlib

            attrs.append((importlib.import_module(modpath), attr))
    bench_set = {**workload.QUERIES, **getattr(workload, "BENCH_EXTRA_QUERIES", {})}
    unknown = [n for n in names if n not in bench_set]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_r17")
    baseline_disabled = set(matpoint.DISABLED)

    # warmup (codegen, python workers) — same spirit as bench.py
    try:
        workload.q6_forecast_revenue(spark, sf_dir).collect()
        for n in names:
            bench_set[n](spark, sf_dir).collect()
    except Exception:
        pass

    res: dict[str, dict[str, list[float]]] = {n: {"on": [], "off": []} for n in names}
    for r in range(args.runs):
        # ABBA ordering across runs cancels linear drift
        order = ["on", "off"] if r % 2 == 0 else ["off", "on"]
        for variant in order:
            matpoint.DISABLED.clear()
            matpoint.DISABLED.update(baseline_disabled)
            if variant == "off":
                matpoint.DISABLED.update(sites)
            for mod, attr in attrs:
                setattr(mod, attr, variant == "on")
            for n in names:
                res[n][variant].append(_time_query(spark, sf_dir, n, bench_set[n]))
            gc.collect()
    matpoint.DISABLED.clear()
    matpoint.DISABLED.update(baseline_disabled)

    out = {}
    print(f"{'query':44s}{'on(med)':>9s}{'off(med)':>9s}{'off/on':>8s}  raw")
    for n in names:
        mon = statistics.median(res[n]["on"])
        moff = statistics.median(res[n]["off"])
        out[n] = {"on": res[n]["on"], "off": res[n]["off"],
                  "on_med": mon, "off_med": moff,
                  "ratio_off_over_on": round(moff / mon, 3) if mon else None}
        print(f"{n:44s}{mon:9.2f}{moff:9.2f}{moff/mon:8.2f}  "
              f"on={res[n]['on']} off={res[n]['off']}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"sites": sorted(sites), "runs": args.runs,
                       "queries": out}, f, indent=1)


if __name__ == "__main__":
    main()
