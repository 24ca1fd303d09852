"""Engine-portable sketching: HyperLogLog (NDV), count-min (frequency),
fixed-grid histogram (quantiles).

Native approximate aggregates (`approx_count_distinct`,
`approx_count_distinct` in DuckDB) use engine-private hash functions, so
their estimates can never cross-check. This HLL is built instead from
the repo's shared 60-bit md5 hash (`functions/hashing.py`) with all
register math in EXACT integer arithmetic, which makes the final
estimate a deterministic function of the input SET — bit-identical in
Spark and DuckDB, so the sketch carries a full value-level oracle
(the `agg_ndv_by_tag` gate entry's ``hll`` leg) rather than the
rows-only check approximate aggregates usually force.

Sketch layout (p = 8, m = 256 registers):

* ``bucket = h & 255`` (low 8 bits), ``rest`` = the remaining 52 bits;
* ``rho`` = leading-zero count of ``rest`` within 52 bits + 1
  = ``53 - bitlen(rest)``, where ``bitlen`` is the length of the
  binary string (Spark ``conv(x, 10, 2)`` == DuckDB ``bin(x)`` —
  verified identical including 0 -> '0');
* registers ``M_j = max(rho)`` — an integer max, order-free;
* the harmonic denominator ``sum(2^-M_j)`` is scaled to integers:
  ``S = zeros * 2^53 + sum(2^(53 - M_j))`` ≤ 256·2^53 < 2^62 — an
  EXACT BIGINT sum (the usual double harmonic sum is partition-order
  dependent in its last ulp, which would break the oracle);
* estimate: ``alpha_256 · m² · 2^53 / S``, with the standard
  linear-counting switch ``E ≤ 2.5m ∧ zeros > 0 → m·ln(m/zeros)``.
  The two ``ln``/division seams follow the LM scorer's guard-band
  discipline — and the linear-counting branch's input domain is just
  {1..255}, so the guard band is verified over EVERY possible input in
  ``tests/test_sketches.py``, not merely the fixture's.

Why it scales: registers are a (key, 256)-bounded table regardless of
input size, built by one hash aggregation with map-side combine;
sketches MERGE by register max (tested), which is what makes NDV
maintainable under streaming ingest / partitioned scans at 100 TB —
the exact ``count(DISTINCT)`` twin needs a full shuffle of every
distinct value instead.

Reference scope note: the reference engine has no approximate
aggregates (SURVEY §2.6) — this is north-star surface for the
training-pipeline side (e.g. per-source distinct-document or
distinct-timestamp telemetry over corpus-scale tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.hashing import md5_long, md5_long_sql
from timeseries_db_spark.functions.numeric import duck_round

HLL_P = 8
HLL_M = 1 << HLL_P  # 256
#: 0.7213 / (1 + 1.079/m) for m = 256 — inlined as the exact IEEE
#: double literal so both engines hold the same constant.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_REST_BITS = 60 - HLL_P  # 52
_SCALE = 1 << (_REST_BITS + 1)  # 2^53: 2^(53 - M) exact for M in 1..53


def hll_registers(df: DataFrame, key: str, value_col) -> DataFrame:
    """(key, bucket, m) — the register table: max leading-zero rank per
    (key, low-8-bits-of-hash) bucket. ``value_col`` must be a STRING
    column expression (hash-input canonicalization is the caller's
    contract, exactly as for the dedup hashes)."""
    h = md5_long(value_col)
    bucket = (h % F.lit(HLL_M)).alias("bucket")
    rest = F.shiftright(h, HLL_P)
    rho = (
        F.when(rest == 0, F.lit(_REST_BITS + 1))
        .otherwise(F.lit(_REST_BITS + 1) - F.length(F.conv(rest, 10, 2)))
        .alias("rho")
    )
    return (
        df.select(F.col(key).alias("key"), bucket, rho)
        .groupBy("key", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(key, ndv_est) from a register table — see module docstring for
    the exact-integer harmonic form and the linear-counting switch."""
    agg = registers.groupBy("key").agg(
        F.sum(
            F.expr(f"CAST(shiftleft(1L, {_REST_BITS + 1} - m) AS BIGINT)")
        ).alias("s_seen"),
        F.count(F.lit(1)).alias("n_seen"),
    )
    zeros = F.lit(HLL_M) - F.col("n_seen")
    s = zeros.cast("long") * F.lit(_SCALE) + F.col("s_seen")
    raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(_SCALE))
        / s.cast("double")
    )
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), lc).otherwise(raw)
    return agg.select("key", duck_round(est, 4).alias("ndv_est"))


def hll_ndv(df: DataFrame, key: str, value_col) -> DataFrame:
    """(key, ndv_est) — approximate distinct ``value_col`` per ``key``."""
    return hll_estimate(hll_registers(df, key, value_col))


def hll_regs_cte_sql(table_sql: str, key: str, value_expr: str) -> str:
    """CTE body producing the register table (key, bucket, m) in DuckDB
    — the composable seam shared by :func:`hll_ndv_sql` and
    :func:`hll_overlap_sql`."""
    h = md5_long_sql(value_expr)
    return f"""
        SELECT key, bucket,
               max(CASE WHEN rest = 0 THEN {_REST_BITS + 1}
                        ELSE {_REST_BITS + 1} - length(bin(rest)) END) AS m
        FROM (
            SELECT {key} AS key,
                   {h} % {HLL_M} AS bucket,
                   {h} // {HLL_M} AS rest
            FROM ({table_sql})
        ) GROUP BY key, bucket
    """


def hll_estimate_sql(regs_rel: str) -> str:
    """SELECT text estimating (key, ndv_est) from a register relation
    named ``regs_rel`` — identical expression tree to
    :func:`hll_estimate`."""
    return f"""
        SELECT key,
               round(CASE
                   WHEN ('{HLL_ALPHA!r}'::DOUBLE * {float(HLL_M * HLL_M)}
                         * {float(_SCALE)}
                         / (({HLL_M} - n_seen)::BIGINT * {_SCALE} + s_seen)::DOUBLE)
                        <= {2.5 * HLL_M}
                        AND ({HLL_M} - n_seen) > 0
                   THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_seen)::DOUBLE)
                   ELSE '{HLL_ALPHA!r}'::DOUBLE * {float(HLL_M * HLL_M)}
                        * {float(_SCALE)}
                        / (({HLL_M} - n_seen)::BIGINT * {_SCALE} + s_seen)::DOUBLE
               END, 4) AS ndv_est
        FROM (
            SELECT key,
                   sum((1::BIGINT << ({_REST_BITS + 1} - m)))::BIGINT AS s_seen,
                   count(*) AS n_seen
            FROM {regs_rel} GROUP BY key
        )
    """


def hll_ndv_sql(table_sql: str, key: str, value_expr: str) -> str:
    """DuckDB twin of :func:`hll_ndv` on ``value_expr`` (a VARCHAR
    expression) grouped by ``key``."""
    return f"""
        WITH regs AS ({hll_regs_cte_sql(table_sql, key, value_expr)})
        {hll_estimate_sql("regs")}
    """


def hll_overlap(
    regs: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """(key, ndv_a, ndv_b, union_est, inter_est) per requested key pair
    (``key`` is ``"a|b"``) — HLL SET OPERATIONS over one register
    table: union registers merge by ``max`` (exact, the sketch's defining
    property), the intersection is inclusion-exclusion over the three
    estimates, floored at 0 (I-E can go negative within sketch error).

    The cross-split corpus question this answers — "how much does the
    train vocabulary overlap valid/test?" — needs only the per-split
    register tables, never a re-scan of either corpus side: at 100 TB
    the registers are (splits × 256) rows maintained incrementally,
    and every set algebra question is a fold over them."""
    if not pairs:
        raise ValueError("hll_overlap needs at least one key pair")
    for a, b in pairs:
        if "|" in a or "|" in b:
            raise ValueError(
                f"hll_overlap pair keys must not contain '|': {(a, b)!r} "
                "(the pair key 'a|b' must parse unambiguously)"
            )
    legs = None
    for a, b in pairs:
        leg = regs.filter(F.col("key").isin(a, b)).select(
            F.lit(f"{a}|{b}").alias("key"), "bucket", "m"
        )
        legs = leg if legs is None else legs.unionByName(leg)
    union_regs = legs.groupBy("key", "bucket").agg(F.max("m").alias("m"))
    unions = hll_estimate(union_regs).withColumnRenamed("ndv_est", "union_est")
    singles = hll_estimate(regs)
    a_est = singles.select(
        F.col("key").alias("ka"), F.col("ndv_est").alias("ndv_a")
    )
    b_est = singles.select(
        F.col("key").alias("kb"), F.col("ndv_est").alias("ndv_b")
    )
    split = unions.select(
        "key",
        F.substring_index("key", "|", 1).alias("ka"),
        F.substring_index("key", "|", -1).alias("kb"),
        "union_est",
    )
    return (
        split.join(a_est, "ka")
        .join(b_est, "kb")
        .select(
            "key",
            "ndv_a",
            "ndv_b",
            "union_est",
            F.greatest(
                F.lit(0.0),
                duck_round(
                    F.col("ndv_a") + F.col("ndv_b") - F.col("union_est"), 4
                ),
            ).alias("inter_est"),
        )
    )


def hll_overlap_sql(
    table_sql: str, key: str, value_expr: str, pairs: list[tuple[str, str]]
) -> str:
    """DuckDB twin of :func:`hll_overlap` composed over the same
    register CTE."""
    pair_regs = "\nUNION ALL\n".join(
        f"SELECT '{a}|{b}' AS key, bucket, m FROM regs WHERE key IN ('{a}', '{b}')"
        for a, b in pairs
    )
    return f"""
        WITH regs AS ({hll_regs_cte_sql(table_sql, key, value_expr)}),
        uregs AS (
            SELECT key, bucket, max(m) AS m FROM ({pair_regs}) GROUP BY key, bucket
        ),
        singles AS ({hll_estimate_sql("regs")}),
        unions AS ({hll_estimate_sql("uregs")})
        SELECT u.key, a.ndv_est AS ndv_a, b.ndv_est AS ndv_b,
               u.ndv_est AS union_est,
               greatest(0.0, round(a.ndv_est + b.ndv_est - u.ndv_est, 4))
                   AS inter_est
        FROM unions u
        JOIN singles a ON a.key = split_part(u.key, '|', 1)
        JOIN singles b ON b.key = split_part(u.key, '|', 2)
    """


# ---------------------------------------------------------------------------
# Count-min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------

#: d = 4 hash rows x w = 1024 counters: overcount per row ~ N/w of the
#: total stream N; the min over 4 independent rows makes a large error
#: exponentially unlikely. 4 KiB of counters per keyed sketch.
CMS_D = 4
CMS_W = 1024


def _cms_idx(value_col, row: int):
    """Counter index of ``value_col`` in hash row ``row`` — the shared
    60-bit md5 hash over a row-salted input, so the d rows are
    independent and every index is engine-reproducible."""
    return md5_long(F.concat(F.lit(f"cms{row}:"), value_col)) % F.lit(CMS_W)


def _cms_idx_sql(value_expr: str, row: int) -> str:
    salted = f"('cms{row}:' || {value_expr})"
    return f"({md5_long_sql(salted)} % {CMS_W})"


def cms_counters(
    df: DataFrame, value_col, weight_col: str | None = None
) -> DataFrame:
    """(row, idx, cnt) — the d x w counter table of the count-min sketch
    over ``value_col`` occurrences (a STRING column expression). One
    hash aggregation with map-side combine onto a table BOUNDED at
    d·w = 4096 rows regardless of input size; counters are exact BIGINT
    sums, so two sketches MERGE by adding counters (tested) — the
    streaming-maintainable frequency table.

    ``weight_col``: build the IDENTICAL counter table from a
    pre-aggregated (value, count) frame instead of the raw occurrence
    stream — counters are additive, so summing weights == counting
    occurrences (tested). Lets a pipeline that already paid the
    per-value aggregation (e.g. a vocabulary count) sketch |distinct|
    rows instead of re-exploding the corpus."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_idx(value_col, r).alias("idx"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("ri"),
        *([F.col(weight_col).alias("_w")] if weight_col else []),
    ).select(
        F.col("ri.row").alias("row"),
        F.col("ri.idx").alias("idx"),
        *([F.col("_w")] if weight_col else []),
    )
    agg = F.sum("_w") if weight_col else F.count(F.lit(1))
    return rows.groupBy("row", "idx").agg(agg.cast("long").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    items: DataFrame,
    item_col: str,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(item, *carry, est) — point-query the sketch for every row of
    ``items``: est = min over the d rows of the counter each row hashes
    the item to. ``items`` is a small frame (the candidate
    heavy-hitters); the probe is a broadcast join of d·|items| rows
    against the 4096-row counter table — never a corpus-side shuffle.
    The estimate NEVER undercounts (every occurrence incremented every
    row's counter); overcount is the min of d independent ~N/w
    collisions. ``carry`` columns of ``items`` pass through unchanged."""
    probes = items.select(
        F.col(item_col).alias("item"),
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_idx(F.col(item_col), r).alias("idx"),
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("ri"),
    ).select(
        "item", *carry, F.col("ri.row").alias("row"), F.col("ri.idx").alias("idx")
    )
    return (
        probes.join(F.broadcast(counters), ["row", "idx"], "left")
        .groupBy("item", *carry)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_token_estimates_sql(vocab_sql: str, n_rows: int = CMS_D) -> str:
    """DuckDB twin of counters + estimates for the corpus token stream,
    probed with the tokens of ``vocab_sql`` (a query with a ``token``
    column)."""
    from timeseries_db_spark.operators.text import TOKENS_DUCK

    row_values = ", ".join(f"({r})" for r in range(n_rows))
    return f"""
        WITH toks AS (
            SELECT unnest({TOKENS_DUCK}) AS token FROM documents
        ),
        tok AS (SELECT token FROM toks WHERE token <> ''),
        counters AS (
            SELECT r.row,
                   CASE r.row
                       WHEN 0 THEN {_cms_idx_sql("token", 0)}
                       WHEN 1 THEN {_cms_idx_sql("token", 1)}
                       WHEN 2 THEN {_cms_idx_sql("token", 2)}
                       ELSE {_cms_idx_sql("token", 3)}
                     END AS idx,
                   count(*)::BIGINT AS cnt
            FROM tok CROSS JOIN (VALUES {row_values}) r(row)
            GROUP BY 1, 2
        ),
        vocab AS ({vocab_sql}),
        probes AS (
            SELECT v.token AS item, r.row,
                   CASE r.row
                       WHEN 0 THEN {_cms_idx_sql("v.token", 0)}
                       WHEN 1 THEN {_cms_idx_sql("v.token", 1)}
                       WHEN 2 THEN {_cms_idx_sql("v.token", 2)}
                       ELSE {_cms_idx_sql("v.token", 3)}
                     END AS idx
            FROM vocab v CROSS JOIN (VALUES {row_values}) r(row)
        )
        SELECT item, min(coalesce(c.cnt, 0))::BIGINT AS est
        FROM probes p LEFT JOIN counters c USING (row, idx)
        GROUP BY item
    """


# ---------------------------------------------------------------------------
# Fixed-grid histogram (mergeable approximate quantiles)
# ---------------------------------------------------------------------------

#: 256 equal-width buckets over a CONFIGURED [lo, hi) domain. The grid
#: must be input-independent for mergeability (per-key min/max grids
#: cannot combine across batches); at 100 TB the metric's domain is a
#: config fact — where it isn't, a first pass pins min/max. Quantile
#: error is bounded by one bucket width.
HIST_BUCKETS = 256


def histogram_counts(
    df: DataFrame, key: str, value_col: str, lo: float, hi: float
) -> DataFrame:
    """(key, b, cnt) — bucket counts on the fixed grid: ONE hash
    aggregation with map-side combine onto <= keys x 256 rows; merges
    across batches/partitions by ADDING counts, exactly like the CMS
    counter table. Out-of-range values clamp into the edge buckets (a
    count-preserving choice: quantile MASS is never dropped, edge
    estimates degrade to the bucket bound). NULL and NaN values are
    EXCLUDED before bucketing — without the filter both engines'
    NULL-skipping least/greatest would clamp floor(NULL)=NULL into the
    top bucket, silently counting dropout rows that the exact
    percentile leg ignores."""
    width = (hi - lo) / HIST_BUCKETS
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(0), F.least(F.lit(HIST_BUCKETS - 1), b))
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(F.col(key).alias("key"), b.cast("int").alias("b"))
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, qs: tuple[float, ...], lo: float, hi: float
) -> DataFrame:
    """(key, q, est) — quantiles from a histogram: find the bucket
    holding rank ``ceil(q * n)``, interpolate linearly inside it. All
    inputs to the interpolation are exact BIGINTs plus the fixed grid
    constants, and the expression tree is shared with the SQL twin, so
    the rounded estimate is engine-exact — which is what lets an
    APPROXIMATE quantile carry a full value oracle (native
    approx_percentile/t-digest implementations cannot cross-check).
    ALL requested quantiles come out of ONE cumsum pass over the
    histogram (the <=256-row-per-key table is exploded x len(qs), not
    re-aggregated per q — Catalyst does no cross-branch CSE, so a
    per-q DataFrame would re-execute the upstream scan+agg each time).
    Per-key work is a <=256-row window cumsum — trivially bounded."""
    from pyspark.sql import Window

    width = (hi - lo) / HIST_BUCKETS
    w = Window.partitionBy("key").orderBy("b")
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("total", F.sum("cnt").over(Window.partitionBy("key")))
        .select("*", F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"))
    )
    r = F.ceil(F.col("q") * F.col("total"))
    hit = cum.filter(F.col("cum") >= r)
    first = hit.groupBy("key", "q").agg(
        F.expr("min_by(struct(b, cnt, cum), b)").alias("s"),
        F.max(r).alias("r"),
    )
    frac = (
        F.col("r").cast("double")
        - (F.col("s.cum") - F.col("s.cnt")).cast("double")
    ) / F.col("s.cnt").cast("double")
    est = F.lit(lo) + F.lit(width) * (F.col("s.b").cast("double") + frac)
    return first.select("key", "q", duck_round(est, 4).alias("est"))


def histogram_quantile(
    hist: DataFrame, q: float, lo: float, hi: float
) -> DataFrame:
    """(key, est) — single-q convenience wrapper over
    :func:`histogram_quantiles`."""
    return histogram_quantiles(hist, (q,), lo, hi).select("key", "est")


def histogram_quantiles_sql(
    table_sql: str,
    key: str,
    value_expr: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...],
) -> str:
    """DuckDB twin: one histogram CTE, one quantile SELECT per q,
    identical grid constants and interpolation tree."""
    width = (hi - lo) / HIST_BUCKETS
    parts = []
    for q in qs:
        parts.append(f"""
        SELECT key, {q!r} AS q,
               round({lo!r} + {width!r} * (s_b + (r::DOUBLE - (s_cum - s_cnt)::DOUBLE) / s_cnt::DOUBLE), 4) AS est
        FROM (
            SELECT key,
                   min_by(b, b) AS s_b,
                   min_by(cnt, b) AS s_cnt,
                   min_by(cum, b) AS s_cum,
                   max(r) AS r
            FROM (
                SELECT key, b, cnt,
                       sum(cnt) OVER (PARTITION BY key ORDER BY b) AS cum,
                       ceil({q!r} * sum(cnt) OVER (PARTITION BY key)) AS r
                FROM hist
            )
            WHERE cum >= r
            GROUP BY key
        )""")
    union = " UNION ALL ".join(parts)
    return f"""
        WITH t AS ({table_sql}),
        hist AS (
            SELECT key, b, count(*)::BIGINT AS cnt
            FROM (
                SELECT {key} AS key,
                       greatest(0, least({HIST_BUCKETS - 1},
                           floor(({value_expr} - {lo!r}) / {width!r})))::INT AS b
                FROM t
                WHERE {value_expr} IS NOT NULL
                  AND NOT isnan(({value_expr})::DOUBLE)
            )
            GROUP BY key, b
        )
        {union}
    """
