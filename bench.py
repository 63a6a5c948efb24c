"""Benchmark runner: times every workload query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from execute_sync_spark.session import get_spark
from execute_sync_spark.plans import workload


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    # JVM/codegen warmup on the smallest query so per-query times reflect the
    # plan, not first-call class loading.
    workload.q6_forecast_revenue(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name, fn in workload.QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "workload_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
