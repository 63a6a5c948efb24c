"""Dump .explain("formatted") for named queries into plans/r17/<q>_<tag>.txt.

    python tools/plan_r17.py before q1,q2,...
    python tools/plan_r17.py after q1,q2,...

Construction runs any eager materializations the query performs, so the
dumped plan is exactly what the bench executes for the final action.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.session import get_spark
from execute_sync_spark.plans import workload

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "plans", "r17")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    bench_set = {**workload.QUERIES, **getattr(workload, "BENCH_EXTRA_QUERIES", {})}
    unknown = [n for n in names if n not in bench_set]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    os.makedirs(OUT, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_r17")
    for n in names:
        df = bench_set[n](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{n}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {n}_{tag}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
