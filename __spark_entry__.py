"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` / ``oracle_sql()`` are the
per-operator correctness gate (Spark vs DuckDB at sf=0.01). Implementations
live in ``execute_sync_spark.plans.workload``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from execute_sync_spark.plans import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in workload.ORACLES.items() if v is not None}
