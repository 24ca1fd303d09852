"""Cross-engine deterministic numeric helpers.

Two float hazards, both observed as real mismatches at sf0.1:

* a DOUBLE ``sum`` is partition-order dependent in its last ulp, which
  flips ``round(x, 4)`` when the true value sits on a ``.00005``
  boundary → sum in DECIMAL instead (exact, associative, identical in
  Spark and DuckDB);
* Spark's ``round(double)`` rounds the *shortest decimal string* of the
  double (``BigDecimal.valueOf``), while DuckDB rounds the binary value
  (empirically ``floor(x*10^s + 0.5)/10^s``, sign-mirrored; verified on
  200k random + pathological samples) — at an exact decimal tie such as
  51.51125 the two disagree.

So the deterministic recipe for a rounded ratio is: exact DECIMAL sum →
cast to DOUBLE (same value both engines) → divide by the count (same
IEEE op) → round with :func:`duck_round` on the Spark side and plain
``round`` on the DuckDB side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def duck_round(col: Column, scale: int = 4) -> Column:
    """Round a DOUBLE column exactly the way DuckDB's ``round(x, s)``
    does — on the binary value, half away from zero:
    ``floor(x*10^s + 0.5)/10^s`` for x ≥ 0, mirrored for negatives
    (``ceil(x - 0.5) == -floor(-x + 0.5)``). Identical IEEE ops on the
    same input double ⇒ identical output in both engines."""
    m = float(10**scale)
    pos = F.floor(col * m + F.lit(0.5))
    neg = -F.floor(-col * m + F.lit(0.5))
    return (F.when(col >= 0, pos).otherwise(neg) / F.lit(m)).cast("double")


def duck_round_sql(expr: str, scale: int = 4) -> str:
    """Spark-SQL-text twin of :func:`duck_round` — the same expression
    tree built as ONE parse instead of ~10 py4j round trips (r17, guide
    §5 driver latency: each Column-API call is a JVM round trip, and the
    rounded-ratio helpers sit inside every analytics plan build). The
    CASE duplicates ``expr`` exactly like the Column form duplicates its
    input subtree, so analyzed plans are identical."""
    m = float(10**scale)
    return (
        f"CAST((CASE WHEN ({expr}) >= 0 THEN floor(({expr}) * {m} + 0.5) "
        f"ELSE -floor(-({expr}) * {m} + 0.5) END) / {m} AS DOUBLE)"
    )


def np_duck_round(a: "np.ndarray", scale: int = 4) -> "np.ndarray":
    """numpy twin of :func:`duck_round` — np.round is half-to-even and
    disagrees with DuckDB/duck_round at exact ties. ``+ 0.0`` at the end
    normalizes IEEE ``-0.0`` to ``+0.0``: the Spark twin floors through
    a LONG (no signed zero exists there), while np.floor keeps the sign
    of a tiny negative — without the normalization the two diverge at
    the bit level on values that round to zero."""
    m = 10.0**scale
    return np.where(a >= 0, np.floor(a * m + 0.5), -np.floor(-a * m + 0.5)) / m + 0.0


def duck_div(col: Column, divisor: int) -> Column:
    """Integer division matching DuckDB's ``//`` on integer operands:
    truncation toward ZERO (measured: ``-7200001 // 3600000 = -2`` in
    DuckDB — its integer ``//`` is NOT floor division), in exact integer
    arithmetic.

    Delegates to Spark's native integral ``div`` (JVM long division —
    exact at any magnitude, trunc-toward-zero like DuckDB), unlike
    ``cast(col / d as long)`` or a subtract-remainder-then-``/`` form,
    whose double division loses ulps for |col| ≥ 2^53 (verified:
    2518762692304800000 // 3600000 comes out one low through a double)."""
    return F.call_function("div", col, F.lit(divisor))
