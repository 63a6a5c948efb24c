"""Round-17 diagnosis: why does per-pass executor work GROW with session age?

Runs the 24-stream concurrent pass N times in one session; between passes
records leaked persistent RDD count (localCheckpoint blocks whose py4j
refs are gone but whose JVM cleanup has not run), block-manager storage
bytes, and cumulative JVM GC time. Before the LAST pass, forces cleanup
(python gc -> py4j finalizers -> JVM System.gc -> ContextCleaner) — if
that pass's wall drops back to pass-1 levels, accumulated block/GC state
is the growth mechanism and session hygiene is the fix.

Run ALONE: python tools/session_age_probe.py [n_passes]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.plans import workload
from execute_sync_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _gc_ms(spark) -> float:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _storage(spark):
    sc = spark.sparkContext
    n_rdds = sc._jsc.getPersistentRDDs().size()
    status = sc._jvm.org.apache.spark.SparkEnv.get().blockManager().master().getMemoryStatus()
    # sum (max-remaining) over block managers
    it = status.iterator()
    used = 0
    while it.hasNext():
        kv = it.next()
        mx, rem = kv._2()._1(), kv._2()._2()
        used += mx - rem
    return n_rdds, used


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("session_age_probe")
    order = sorted(workload.QUERIES.items(), key=lambda kv: kv[0])

    def _run(item):
        item[1](spark, SF_DIR).collect()

    out = []
    for i in range(n_passes):
        cleaned = False
        if i == n_passes - 1:
            # force full cleanup before the last pass
            gc.collect()
            spark._jvm.System.gc()
            time.sleep(5)
            gc.collect()
            spark._jvm.System.gc()
            time.sleep(5)
            cleaned = True
        rdds0, bytes0 = _storage(spark)
        g0 = _gc_ms(spark)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=24) as ex:
            list(ex.map(_run, order))
        wall = round(time.perf_counter() - t0, 3)
        rdds1, bytes1 = _storage(spark)
        g1 = _gc_ms(spark)
        rec = {
            "pass": i + 1,
            "cleaned_before": cleaned,
            "wall_sec": wall,
            "gc_sec_during": round((g1 - g0) / 1000.0, 1),
            "persistent_rdds_before": rdds0,
            "persistent_rdds_after": rdds1,
            "storage_bytes_before": bytes0,
            "storage_bytes_after": bytes1,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
