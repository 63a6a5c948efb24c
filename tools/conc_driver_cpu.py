"""Driver-CPU attribution for the concurrent pass (round 15, follow-up to
tools/conc_sched_experiment.py).

The scheduler experiment showed every config pinned at ~60-69% system CPU
utilization with the wall unmoved by executor-side scheduling (weighted
tokens cut heavy in-stream dilation 5.3x -> 1.5x at IDENTICAL wall). The
remaining hypotheses for the binding constraint:

  (a) the PySpark driver process (GIL: 24 submit threads serializing
      py4j job submission + result fetch) — r11's "driver-bound floor",
  (b) stage-DAG critical paths / packing inefficiency inside the JVM,
  (c) external host load polluting the system-wide counter.

This tool attributes CPU during one 24-stream pass to OUR process tree,
split three ways — driver python (this pid), the Spark JVM, the pyspark
Arrow workers — by sampling /proc/<pid>/stat utime+stime. If driver-python
busy ~= wall (one full core), the GIL submit path is the floor (a); if the
tree total is far under the system-wide busy, (c) is inflating the
experiment's utilization numbers.

Run ALONE from the repo root: python tools/conc_driver_cpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.plans import workload
from execute_sync_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HZ = 100.0  # USER_HZ, Linux ABI constant


def _children(pid: int) -> list[int]:
    try:
        with open(f"/proc/{pid}/task/{pid}/children") as f:
            return [int(x) for x in f.read().split()]
    except OSError:
        return []


def _tree(pid: int) -> list[int]:
    out, stack = [], [pid]
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(_children(p))
    return out


def _cpu_of(pid: int) -> float:
    """utime+stime of one pid in seconds (0 if gone)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / HZ  # utime, stime
    except (OSError, IndexError, ValueError):
        return 0.0


def _comm(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/comm") as f:
            return f.read().strip()
    except OSError:
        return "?"


def _sys_busy() -> float:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return (sum(v) - v[3] - (v[4] if len(v) > 4 else 0)) / HZ


def snapshot() -> dict[str, float]:
    """CPU seconds per bucket over our tree: driver / jvm / workers."""
    me = os.getpid()
    buckets = {"driver_python": 0.0, "jvm": 0.0, "python_workers": 0.0, "other": 0.0}
    for pid in _tree(me):
        c = _comm(pid)
        cpu = _cpu_of(pid)
        if pid == me:
            buckets["driver_python"] += cpu
        elif "java" in c:
            buckets["jvm"] += cpu
        elif "python" in c:
            buckets["python_workers"] += cpu
        else:
            buckets["other"] += cpu
    return buckets


def _jvm_pid(me: int) -> int | None:
    for pid in _tree(me):
        if "java" in _comm(pid):
            return pid
    return None


def _jvm_threads(pid: int) -> dict[str, float]:
    """Per-thread CPU seconds of the JVM, keyed comm:tid (comm truncates
    to 15 chars — 'dag-scheduler-e' IS the DAGScheduler event loop)."""
    out: dict[str, float] = {}
    base = f"/proc/{pid}/task"
    try:
        tids = os.listdir(base)
    except OSError:
        return out
    for tid in tids:
        try:
            with open(f"{base}/{tid}/stat") as f:
                head, tail = f.read().rsplit(")", 1)
            comm = head.split("(", 1)[1]
            parts = tail.split()
            out[f"{comm}:{tid}"] = (int(parts[11]) + int(parts[12])) / HZ
        except (OSError, IndexError, ValueError):
            continue
    return out


def main() -> None:
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    seq_times = detail.get("queries", {})
    spark = get_spark("conc_driver_cpu")
    order = sorted(
        workload.QUERIES.items(), key=lambda kv: -seq_times.get(kv[0], 0.0)
    )

    def _run(item):
        item[1](spark, SF_DIR).collect()

    # warmup (codegen + page cache), discarded
    with ThreadPoolExecutor(max_workers=24) as ex:
        list(ex.map(_run, order))

    jvm = _jvm_pid(os.getpid())
    results = {}
    for rep in ("pass1", "pass2"):
        j0 = _jvm_threads(jvm) if jvm else {}
        b0, s0, t0 = snapshot(), _sys_busy(), time.perf_counter()
        with ThreadPoolExecutor(max_workers=24) as ex:
            list(ex.map(_run, order))
        wall = round(time.perf_counter() - t0, 3)
        b1, s1 = snapshot(), _sys_busy()
        j1 = _jvm_threads(jvm) if jvm else {}
        jd = {k: round(j1[k] - j0.get(k, 0.0), 1) for k in j1}
        top_threads = dict(
            sorted(jd.items(), key=lambda kv: -kv[1])[:12]
        )
        # the single-threaded scheduler choke points, called out explicitly
        hot = {
            name: {
                "core_sec": sec,
                "fraction_of_wall": round(sec / wall, 3),
            }
            for name, sec in jd.items()
            if sec / wall > 0.5
            and any(p in name for p in ("dag-scheduler", "task-result", "dispatcher"))
        }
        tree = {k: round(b1[k] - b0[k], 1) for k in b1}
        tree_total = round(sum(tree.values()), 1)
        sysb = round(s1 - s0, 1)
        results[rep] = {
            "wall_sec": wall,
            "tree_cpu_core_sec": tree,
            "tree_total_core_sec": tree_total,
            "system_busy_core_sec": sysb,
            "external_core_sec": round(sysb - tree_total, 1),
            "driver_python_core_fraction": round(tree["driver_python"] / wall, 3),
            "tree_utilization_of_32": round(tree_total / (32 * wall), 3),
            "jvm_top_threads_core_sec": top_threads,
            "jvm_scheduler_threads_hot": hot,
        }
        print(rep, json.dumps(results[rep]), flush=True)

    results["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(detail_path) as f:
        detail = json.load(f)
    key = os.environ.get("SPARK_GRAFT_CONC_CPU_KEY", "conc_driver_cpu_r15")
    detail.setdefault("experiments", {})[key] = results
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)


if __name__ == "__main__":
    main()
