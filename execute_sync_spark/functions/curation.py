"""Dataset curation for training pipelines: deterministic, portable
sampling and splitting.

Random sampling (``df.sample``/``sampleBy``) is not reproducible across
engines, partitionings, or reruns — a training pipeline needs the SAME
example to land in the SAME split on every run and every engine. Everything
here keys off the portable md5-prefix hash (functions/hashing.py), so the
assignment is a pure function of the row id: stable under repartitioning,
shuffle order, scale-out, and re-expressible in any SQL warehouse for
audits.

At 100 TB these are narrow projections + a filter (split / fraction) or one
window per group key (balanced cap) — no shuffle for the filters, one
bounded shuffle for the cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from execute_sync_spark.functions.hashing import h32_salted, h32_salted_sql

__all__ = ["hash_bucket", "hash_split", "stratified_hash_sample", "balanced_sample"]

_BUCKETS = 1000


def hash_bucket(id_col: Column | str, salt: int = 0) -> Column:
    """Stable bucket in [0, 1000) from the row id (JVM-side md5 prefix)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return h32_salted(c.cast("string"), salt) % _BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: int = 0,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/... ) by hash-bucket ranges.

    Buckets [0, w1*1000) -> first split, [w1*1000, (w1+w2)*1000) -> second,
    etc. A given id keeps its split across runs, engines, and data growth
    (new rows hash independently; old rows never move)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(id_col, salt)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name] * _BUCKETS
        cond = bucket < int(round(hi))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame, id_col: str, pct: int, salt: int = 0
) -> DataFrame:
    """Keep ~pct/100 of rows, deterministically (bucket < pct*10)."""
    return df.filter(hash_bucket(id_col, salt) < pct * 10)


def balanced_sample(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int, salt: int = 0
) -> DataFrame:
    """Cap every group at ``n_per_group`` rows, chosen by hash order (a
    deterministic uniform draw; ties broken by id). One shuffle on the
    group key; skewed groups are bounded by the cap itself."""
    w = Window.partitionBy(group_col).orderBy(hash_bucket(id_col, salt), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def hash_bucket_sql(expr: str, salt: int = 0) -> str:
    """DuckDB expression computing the same bucket."""
    return f"({h32_salted_sql(f'CAST({expr} AS VARCHAR)', salt)}) % {_BUCKETS}"
