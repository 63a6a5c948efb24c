"""Targeted 30x ratio re-measure for the round-17 long-keyed shingle family.

The four committed scale blocks were measured this morning on r16 code;
the only plan-affecting change since is the long-keyed shingle join.
This re-times just the touched family at base and at the committed 30x
synthesis (warm: second run timed, page cache + codegen warm — the
plan-scaling methodology of bench --warm) and records ratio_vs_base into
BENCH_DETAIL experiments.scale30_touched_r17.

Run ALONE: python tools/scale_touched_r17.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.plans import workload
from execute_sync_spark.session import get_spark
from tools.make_scale10 import build, is_current

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".scale30", "sf3")

QUERIES = [
    "dedup_jaccard_pairs_scaled",
    "dedup_containment_pairs_scaled",
    "dedup_lsh_recall",
    "dedup_minhash_est",
    "graph_doc_pagerank_scaled",
    "graph_label_propagation",
    "graph_triangle_count",
]


def _warm_time(spark, sf_dir, fn):
    fn(spark, sf_dir).collect()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("scale_touched_r17")
    if not is_current(spark, SRC, DST, 30):
        print("30x synthesis stale -> rebuilding")
        build(spark, SRC, DST, 30)
    out = {}
    for n in QUERIES:
        fn = workload.QUERIES[n]
        base = _warm_time(spark, SRC, fn)
        big = _warm_time(spark, DST, fn)
        out[n] = {"base_warm_sec": base, "x30_warm_sec": big,
                  "ratio_vs_base": round(big / base, 1)}
        print(n, out[n], flush=True)
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    detail.setdefault("experiments", {})["scale30_touched_r17"] = {
        "what": "warm 30x/base ratios for the long-keyed shingle family after the r17 join-key change",
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "queries": out,
    }
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)


if __name__ == "__main__":
    main()
