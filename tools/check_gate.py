"""Local mirror of the driver's correctness gate for a subset of queries.

Usage: python tools/check_gate.py [query ...]   (default: all gated w/ oracle)

Runs each Spark query and its DuckDB oracle at sf0.01 and compares
row count, column dtypes, and sorted values (dtype-strict, like the
driver's value-hash), printing one status line per query.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from execute_sync_spark.session import get_spark

    spark = get_spark()
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = sys.argv[1:] or [k for k in list(qs)[:50] if k in oracles]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet/**/*.parquet', hive_partitioning=true)"
            if os.path.isdir(os.path.join(SF_DIR, f"{t}.parquet"))
            and not os.path.isfile(os.path.join(SF_DIR, f"{t}.parquet"))
            else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"{name}: NO_ORACLE spark_rows={len(sdf)}")
                continue
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        cols = sorted(sdf.columns)
        ocols = sorted(odf.columns)
        if cols != ocols:
            print(f"{name}: SCHEMA cols {cols} != {ocols}")
            failures += 1
            continue

        # the driver tolerates timestamp resolution (ns vs us) and integer
        # width (int32 vs int64) differences; it does NOT tolerate int vs
        # float (r5 q_merge_upsert) — normalize the tolerated ones only
        def _norm(df):
            df = df.copy()
            for c in df.columns:
                k = str(df[c].dtype)
                if k.startswith("datetime64"):
                    df[c] = df[c].astype("datetime64[us]")
                elif k in ("int8", "int16", "int32"):
                    df[c] = df[c].astype("int64")
            return df

        sdf, odf = _norm(sdf), _norm(odf)
        dt_l = [str(sdf[c].dtype) for c in cols]
        dt_r = [str(odf[c].dtype) for c in cols]
        sv = sorted(map(repr, sdf[cols].itertuples(index=False, name=None)))
        ov = sorted(map(repr, odf[cols].itertuples(index=False, name=None)))
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)}!={len(odf)}")
        if dt_l != dt_r:
            status.append(f"DTYPES {dt_l}!={dt_r}")
        if sv != ov:
            n_diff = sum(1 for a, b in zip(sv, ov) if a != b)
            status.append(f"VALUES {n_diff} rows differ")
            for a, b in zip(sv, ov):
                if a != b:
                    status.append(f"  spark={a}\n  duck ={b}")
                    break
        if status:
            print(f"{name}: FAIL " + "; ".join(status[:3]))
            failures += 1
        else:
            print(f"{name}: OK rows={len(sdf)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
