"""Exact-NTILE vs approx-percentile CCNet tiling on a SKEWED corpus
(VERDICT r10 task 5: "demonstrate or bound the approx-CCNet crossover").

The approx form's reason to exist is the regime the committed testdata never
reaches: ONE dominant language, so the exact form's NTILE window becomes a
single-task sort of (almost) the whole corpus while the approx form stays a
distributed one-pass sketch + broadcast-compare. This script synthesizes
that regime — a single-language corpus with short texts at 10x / 100x /
1000x the committed per-language row count — times both declared functions
end-to-end (noop sink: full computation, nothing on the driver), and
records the numbers under BENCH_DETAIL.json's ``experiments`` key (carried
forward by bench.py's ``_carry_scale_blocks`` so plain bench runs don't
destroy the evidence).

Run: python tools/ccnet_skew_crossover.py [n_rows ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from execute_sync_spark.functions import text as text_fns
from execute_sync_spark.session import get_spark

# 20_000 ~= 10x the committed sf0.1 per-language max (en = 2,059 rows);
# the larger points show where the single-task NTILE sort stops being free.
DEFAULT_SIZES = [20_000, 200_000, 2_000_000]

# tiny vocabulary so unigram_logprob's shared scoring stage is cheap and
# the timing difference isolates the tiling step both forms disagree on
_WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _skewed_docs(spark, n: int):
    """n documents, ALL in one language, 3-word pseudo-random texts
    (hash-derived: deterministic across runs)."""
    w = len(_WORDS)
    words = F.array(*[F.lit(x) for x in _WORDS])
    pick = lambda salt: F.element_at(  # noqa: E731
        words, (F.abs(F.hash(F.col("id") + F.lit(salt))) % w + 1).cast("int")
    )
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat_ws(" ", pick(0), pick(1), pick(2)).alias("text"),
        F.lit("en").alias("lang"),
    )


def _time(df, warm: bool = True) -> float:
    """Noop-sink wall time of the SECOND run (codegen/cache warm) — the
    first end-to-end point otherwise absorbs JVM warmup and reads as a fake
    exact-form loss."""
    if warm:
        df.write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _tiling_only(scored, lang_col: str = "lang", id_col: str = "doc_id"):
    """The two tiling steps ALONE over a pre-materialized scored frame —
    the stage the forms actually disagree on (the unigram-LM scoring
    upstream is shared and dominates the end-to-end numbers). Mirrors
    text.ccnet_buckets / ccnet_buckets_approx exactly."""
    from pyspark.sql import Window

    w = Window.partitionBy(lang_col).orderBy(F.desc("avg_logprob"), F.asc(id_col))
    exact = scored.select(
        id_col,
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), F.ntile(3).over(w)
        ).alias("bucket"),
    )
    thresholds = scored.groupBy(lang_col).agg(
        F.percentile_approx("avg_logprob", [2.0 / 3.0, 1.0 / 3.0], 10000).alias("__t")
    )
    s, t = scored.alias("__s"), thresholds.alias("__t_side")
    approx = s.join(
        F.broadcast(t),
        F.col(f"__s.{lang_col}").eqNullSafe(F.col(f"__t_side.{lang_col}")),
    ).select(
        F.col(f"__s.{id_col}"),
        F.when(F.col("avg_logprob") >= F.element_at("__t", 1), "head")
        .when(F.col("avg_logprob") >= F.element_at("__t", 2), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return exact, approx


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or DEFAULT_SIZES
    spark = get_spark("ccnet-crossover")
    rows = []
    for n in sizes:
        docs = _skewed_docs(spark, n).localCheckpoint(eager=True)
        exact = _time(text_fns.ccnet_buckets(docs))
        approx = _time(text_fns.ccnet_buckets_approx(docs))
        # isolate the tiling stage: score once, checkpoint, time both forms
        scored = (
            text_fns.unigram_logprob(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .localCheckpoint(eager=True)
        )
        ex_t, ap_t = _tiling_only(scored)
        exact_tile, approx_tile = _time(ex_t), _time(ap_t)
        rows.append(
            {
                "rows_one_lang": n,
                "exact_ntile_sec": exact,
                "approx_sketch_sec": approx,
                "approx_speedup": round(exact / approx, 2) if approx else None,
                "tiling_only_exact_sec": exact_tile,
                "tiling_only_approx_sec": approx_tile,
                "tiling_only_speedup": round(exact_tile / approx_tile, 2)
                if approx_tile
                else None,
            }
        )
        print(json.dumps(rows[-1]))
        scored.unpersist()
        docs.unpersist()

    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, ValueError):
        detail = {}
    detail.setdefault("experiments", {})["ccnet_skew_crossover"] = {
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "setup": "single-language synthetic, 3-word texts; exact NTILE's "
        "per-language window = one-task sort of the whole corpus; approx = "
        "percentile_approx sketch + broadcast compare (accuracy 10k)",
        "points": rows,
    }
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"recorded {len(rows)} points -> BENCH_DETAIL.json experiments.ccnet_skew_crossover")


if __name__ == "__main__":
    main()
