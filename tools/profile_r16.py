"""Round-16 optimization profiler: per-query job/stage/shuffle attribution.

For each named query: label it with a job group, run it to completion with
the same ``.collect()`` action the bench uses (optionally the noop sink),
then parse the Spark event log to attribute per-query:

  - wall seconds (same clock as bench.py)
  - number of Spark jobs (sequential driver-side actions: eager
    localCheckpoints, counts, index builds, the final action)
  - summed executor task time (core-seconds actually burned)
  - shuffle read/write bytes and records
  - input bytes read

Usage:
    python tools/profile_r16.py q1,q2,...      # profile named queries
    python tools/profile_r16.py --top N        # N slowest per BENCH_DETAIL
    python tools/profile_r16.py ... --noop     # time with noop sink
    python tools/profile_r16.py ... --plans DIR  # also dump explain() files

Output: one JSON line per query on stdout plus a summary table on stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from execute_sync_spark.session import get_spark
from execute_sync_spark.plans import workload

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVDIR = "/tmp/spark-events-r16"


def _parse_event_log(path: str) -> dict[str, dict]:
    """Aggregate per-job-group metrics from one Spark event log file."""
    job_group: dict[int, str] = {}  # job id -> group
    job_span: dict[int, list[float]] = {}
    stage_job: dict[int, int] = {}  # stage id -> job id
    agg: dict[str, dict] = {}

    def grp(g: str) -> dict:
        return agg.setdefault(
            g,
            {
                "n_jobs": 0,
                "task_time_sec": 0.0,
                "shuffle_write_mb": 0.0,
                "shuffle_read_mb": 0.0,
                "input_mb": 0.0,
                "shuffle_write_recs": 0,
                "n_tasks": 0,
                "job_wall_sec": 0.0,
            },
        )

    # Spark 4 rolling event logs: a directory holding events_*.zstd parts
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, p) for p in os.listdir(path) if p.startswith("events_")
        )
    else:
        parts = [path]

    def _lines():
        for p in parts:
            if p.endswith(".zstd"):
                import io as _io

                import pyarrow as pa

                with pa.CompressedInputStream(pa.OSFile(p, "rb"), "zstd") as rdr:
                    for line in _io.TextIOWrapper(_io.BufferedReader(rdr), encoding="utf-8"):
                        yield line
            else:
                with open(p) as fh:
                    yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                g = (ev.get("Properties") or {}).get("spark.jobGroup.id", "?")
                job_group[jid] = g
                job_span[jid] = [ev.get("Submission Time", 0) / 1000.0, 0.0]
                grp(g)["n_jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_span:
                    job_span[jid][1] = ev.get("Completion Time", 0) / 1000.0
                    g = job_group.get(jid, "?")
                    s, t = job_span[jid]
                    if t > s:
                        grp(g)["job_wall_sec"] += t - s
            elif e == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                jid = stage_job.get(sid)
                g = job_group.get(jid, "?")
                d = grp(g)
                m = ev.get("Task Metrics") or {}
                d["n_tasks"] += 1
                d["task_time_sec"] += m.get("Executor Run Time", 0) / 1000.0
                sw = m.get("Shuffle Write Metrics") or {}
                sr = m.get("Shuffle Read Metrics") or {}
                im = m.get("Input Metrics") or {}
                d["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                d["shuffle_write_recs"] += sw.get("Shuffle Records Written", 0)
                d["shuffle_read_mb"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                d["input_mb"] += im.get("Bytes Read", 0) / 1e6
    for d in agg.values():
        for k in ("task_time_sec", "shuffle_write_mb", "shuffle_read_mb", "input_mb", "job_wall_sec"):
            d[k] = round(d[k], 2)
    return agg


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noop = "--noop" in sys.argv
    plans_dir = None
    if "--plans" in sys.argv:
        plans_dir = sys.argv[sys.argv.index("--plans") + 1]
        os.makedirs(plans_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    bench_set = {**workload.QUERIES, **getattr(workload, "BENCH_EXTRA_QUERIES", {})}
    if "--top" in sys.argv:
        n = int(sys.argv[sys.argv.index("--top") + 1])
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        names = [
            k
            for k, _ in sorted(detail["queries"].items(), key=lambda kv: -kv[1])[:n]
        ]
    else:
        names = args[0].split(",") if args else list(bench_set)
    unknown = [n for n in names if n not in bench_set]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "profile_r16",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
        },
    )
    sc = spark.sparkContext

    # same warmups as bench.py so first-profiled query is not charged them
    try:
        workload.q6_forecast_revenue(spark, sf_dir).collect()
        spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, "x int").collect()
        from pyspark.sql import functions as F
        from execute_sync_spark.functions import dedupe

        dedupe.word_shingles(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        ).select(F.md5("shingle").alias("h")).groupBy("h").count().count()
    except Exception:
        pass

    walls: dict[str, float] = {}
    for name in names:
        fn = bench_set[name]
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        built = time.perf_counter() - t0
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        walls[name] = round(time.perf_counter() - t0, 3)
        if plans_dir:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        sc.setJobGroup("idle", "idle")
        print(f"{name}: wall={walls[name]:.3f}s (build={built:.3f}s)", file=sys.stderr)

    # flush the event log
    spark.stop()
    time.sleep(1)
    logs = [os.path.join(EVDIR, p) for p in os.listdir(EVDIR) if not p.startswith(".")]
    agg: dict[str, dict] = {}
    for lg in logs:
        for g, d in _parse_event_log(lg).items():
            agg[g] = d

    hdr = f"{'query':35s} {'wall':>7s} {'jobs':>5s} {'tasks':>6s} {'cpu_s':>8s} {'shW_MB':>8s} {'shR_MB':>8s} {'in_MB':>8s}"
    print(hdr, file=sys.stderr)
    out = {}
    for name in names:
        d = agg.get(name, {})
        d["wall_sec"] = walls.get(name)
        out[name] = d
        print(
            f"{name:35s} {walls.get(name, 0):7.3f} {d.get('n_jobs', 0):5d} "
            f"{d.get('n_tasks', 0):6d} {d.get('task_time_sec', 0):8.2f} "
            f"{d.get('shuffle_write_mb', 0):8.2f} {d.get('shuffle_read_mb', 0):8.2f} "
            f"{d.get('input_mb', 0):8.2f}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
