"""Order-insensitive DataFrame comparison helpers (mirrors the driver's
row-count + schema + value-hash check)."""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
    return v


def norm_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def assert_df_equal(spark_df, duck_rel, msg: str = ""):
    left = norm_rows(spark_df.toPandas())
    right = norm_rows(duck_rel.df())
    assert len(left) == len(right), f"{msg}: row count {len(left)} != {len(right)}"
    for i, (l, r) in enumerate(zip(left, right)):
        assert l == r, f"{msg}: row {i} differs:\n  spark: {l}\n  duck:  {r}"
