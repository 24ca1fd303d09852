"""Z-order (Morton-curve) clustered layout — multi-dimensional row-group
pruning for tables where NO lexicographic sort order serves every query
dimension.

When one clustering column is low-cardinality (events.tag: 4 values),
``write_tsdb_partitioned``'s ``sort(dt, tag, timestamp)`` is strictly
better — each tag's row groups are contiguous AND time-ordered. Z-order
earns its place when BOTH dimensions are high-cardinality, e.g.
``(user_id, ts)`` on an events table: a ts-sort gives perfect time
pruning but every row group spans the whole user domain (a user probe
reads everything), a user-sort is the mirror image, and Z-order's bit
interleave makes every row group a RECTANGLE in (user, time) space —
both spans shrink like ~1/sqrt(n_groups), so min/max stats prune BOTH
predicate shapes. This is exactly Delta Lake / Databricks OPTIMIZE
ZORDER, built from plain Spark primitives:

1. normalize each dimension to a ``ZBITS``-bit integer (rank-free
   min/max scaling — two scalar aggregates, broadcast as literals);
2. interleave bits into one 2·ZBITS-bit Morton key (a generated JVM
   expression — pure column arithmetic, whole-stage codegen, no UDF);
3. ``repartitionByRange`` on the key (range partitioner sampling
   handles skew) + ``sortWithinPartitions`` — contiguous curve ranges
   per file, locally sorted, so row-group boundaries cut the curve into
   compact rectangles.

At 100 TB the write is one shuffle (the range exchange) — the same cost
as any clustered rewrite — and query-side pruning is free: parquet
min/max row-group stats + ordinary predicate pushdown, no index
structure, no reader-side awareness of the curve at all.
``tests/test_layout.py`` quantifies it with pyarrow footer statistics:
row groups whose [min, max] rectangle misses the predicate are exactly
the groups a reader skips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Bits per dimension: 2×21 = 42-bit keys — fine enough that curve
#: granularity is never the pruning bottleneck, small enough for exact
#: BIGINT arithmetic everywhere.
ZBITS = 21


def _morton_expr(a: str, b: str, bits: int = ZBITS) -> str:
    """SQL expression interleaving two ``bits``-bit nonneg integer
    columns: bit i of ``a`` lands at position 2i+1, of ``b`` at 2i.
    Constant-folded shift/mask terms — codegen-friendly, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(f"(shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1}))")
        terms.append(f"(shiftleft(shiftright({b}, {i}) & 1, {2 * i}))")
    return " + ".join(terms)


def _normalize_expr(col: str, lo: int, hi: int, bits: int = ZBITS) -> str:
    """Scale ``col`` ∈ [lo, hi] to [0, 2^bits): exact integer
    arithmetic, monotone, full-range safe (the product is ≤
    (hi-lo)·2^bits — guard the magnitude by pre-shifting when the
    domain itself is ≥ 2^(63-bits))."""
    span = max(hi - lo, 1)
    if span < (1 << (63 - bits)):
        return f"CAST((({col} - {lo}) * {1 << bits}) DIV {span + 1} AS BIGINT)"
    # huge domains: divide first (loses sub-bucket detail the curve
    # cannot represent anyway)
    return f"CAST((({col} - {lo}) DIV {(span // (1 << bits)) + 1}) AS BIGINT)"


def zorder_key(df: DataFrame, dim_a: str, dim_b: str) -> DataFrame:
    """Attach ``_z``, the Morton key over two numeric columns. The
    min/max normalization bounds come from one scalar aggregate over
    the input (a write-path job runs it once; incremental writers pin
    domain bounds in config instead, exactly like the histogram
    sketch's fixed grid)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(dim_a), F.max(dim_a), F.min(dim_b), F.max(dim_b)
    ).first()
    if lo_a is None or lo_b is None:
        raise ValueError(
            "zorder_key: cannot derive clustering bounds — the input is "
            f"empty or {dim_a}/{dim_b} is all-NULL"
        )
    na = _normalize_expr(dim_a, int(lo_a), int(hi_a))
    nb = _normalize_expr(dim_b, int(lo_b), int(hi_b))
    return df.withColumn("_z", F.expr(_morton_expr(na, nb)))


def write_zorder(
    df: DataFrame,
    path: str,
    dim_a: str,
    dim_b: str,
    *,
    num_files: int = 16,
    block_size_bytes: int | None = None,
) -> None:
    """Write ``df`` Z-order clustered on ``(dim_a, dim_b)``. The ``_z``
    column is kept in the files (8 bytes/row) — dropping it after the
    sort would let Catalyst push the project below the sort and unsort
    the write; keeping it also gives readers the option of curve-range
    predicates."""
    out = (
        zorder_key(df, dim_a, dim_b)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
    )
    writer = out.write.mode("overwrite")
    if block_size_bytes is not None:
        writer = writer.option("parquet.block.size", str(block_size_bytes))
    writer.parquet(path)
