"""Deterministic, engine-portable hashing primitives.

Every hash below is defined so the *same* value is computable in Spark
(built-in JVM functions — no Python UDFs in the hot path) and in ANSI-ish
SQL (DuckDB), which is what lets MinHash/SimHash operators carry a real
value-level oracle instead of a rows-only check.

Base integer hash: the first 15 hex digits of md5 parsed as a base-16
integer (60 bits — fits a signed 64-bit long with headroom for modular
arithmetic). Verified identical: Spark ``conv(substring(md5(x),1,15),16,10)``
== DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1; with operands reduced mod P, products stay
#: under 2^62 — no 64-bit overflow in either engine.
MINHASH_P = 2_147_483_647

#: Number of minhash permutations and the LSH banding (bands × rows).
MINHASH_PERMS = 32
MINHASH_BANDS = 8
MINHASH_ROWS = 4  # PERMS / BANDS

#: SimHash uses the full 60-bit base hash.
SIMHASH_BITS = 60


def _perm_constants() -> list[tuple[int, int]]:
    """(a, b) per permutation — fixed seed so Spark and SQL agree forever."""
    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(MINHASH_PERMS)
    ]


MINHASH_AB = _perm_constants()


def md5_long(col: Column) -> Column:
    """60-bit integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_long`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_value(hash_col: Column, perm: int) -> Column:
    """Permutation ``perm`` applied to a 60-bit hash (Spark side):
    ``(a * (h mod P) + b) mod P``."""
    a, b = MINHASH_AB[perm]
    return (F.lit(a) * (hash_col % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def minhash_value_sql(hash_expr: str, perm: int) -> str:
    """DuckDB twin of :func:`minhash_value`."""
    a, b = MINHASH_AB[perm]
    return f"(({a} * ({hash_expr} % {MINHASH_P}) + {b}) % {MINHASH_P})"
