"""Skew-aware aggregation: two-stage salted groupBy.

AQE handles skewed *joins* automatically (skewJoin.enabled), but a groupBy
whose key distribution is pathological (one document type with billions of
rows, one user with most events) still funnels one key into one reduce task.
Salting splits each key into ``salt`` sub-keys for a partial aggregate, then
combines — at the cost of a second (tiny) shuffle.

Only algebraic aggregates decompose this way; supported: count, sum, min,
max. (avg = sum/count assembled by the caller.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,   # counts add up
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """``aggs`` maps output column -> (fn, input column), fn in
    count/sum/min/max. Example::

        salted_agg(events, ["user_id"], {"n": ("count", "*"),
                                         "total": ("sum", "value")})
    """
    stage1_cols = []
    stage2_cols = []
    for out, (fn, col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"unsupported salted aggregate {fn!r}")
        partial = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        stage1_cols.append(partial.alias(f"__p_{out}"))
        stage2_cols.append(_MERGE[fn](f"__p_{out}").alias(out))

    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*stage1_cols)
    return partial.groupBy(*keys).agg(*stage2_cols)
