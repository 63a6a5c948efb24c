"""Portable deterministic hashing.

MinHash / SimHash / fingerprinting need a hash BOTH the engine (Spark) and the
correctness oracle (DuckDB) can compute identically. Spark's ``hash()`` is
murmur3 with Spark-specific seeding and DuckDB's ``hash()`` is its own — they
never agree. We use the first 8 hex chars of md5 as an unsigned 32-bit value:

    Spark : CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)
    DuckDB: CAST(CAST('0x' || substr(md5(s), 1, 8) AS UBIGINT) AS BIGINT)

md5 is computed JVM-side (codegen'd, no Python); 32 bits is plenty for
min-hashing and bucket assignment. Salting: ``H(s, i)`` hashes ``i || '#' || s``
to derive k independent hash functions from one digest family.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column | str) -> Column:
    """Unsigned-32-bit md5-prefix hash as a non-negative BIGINT (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_salted(col: Column | str, salt: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return h32(F.concat(F.lit(f"{salt}#"), c))


def h32_sql(expr: str) -> str:
    """DuckDB SQL for the same hash."""
    return f"CAST(CAST('0x' || substr(md5({expr}), 1, 8) AS UBIGINT) AS BIGINT)"


def h32_salted_sql(expr: str, salt: int) -> str:
    return h32_sql(f"'{salt}#' || {expr}")


def h32_py(s: str) -> int:
    """Python twin of ``h32`` for DRIVER-side bucket computation (e.g. a
    probe pruning a persisted index to a literal key set): identical to
    the JVM/DuckDB forms on any UTF-8 string."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def h32_salted_py(s: str, salt: int) -> int:
    return h32_py(f"{salt}#{s}")
