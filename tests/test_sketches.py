"""HyperLogLog sketch: cross-engine oracle, accuracy vs exact NDV,
register mergeability (the property that makes it a sketch), and the
EXHAUSTIVE guard band for the linear-counting ln() seam — its input
domain is {1..255} zero-register counts, so every possible libm call
is checked, not a fixture sample."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_db_spark.operators import sketches
from timeseries_db_spark.registry import EVENTS_T
from timeseries_db_spark.sources.tables import events_as_tsdb
from tests.oracle import check_against_duckdb


@pytest.fixture(scope="module")
def tsdb(spark, sf_dir):
    return events_as_tsdb(spark, sf_dir)


def test_hll_matches_oracle(spark, sf_dir, tsdb):
    check_against_duckdb(
        sketches.hll_ndv(tsdb, "tag", F.col("timestamp").cast("string")),
        sketches.hll_ndv_sql(EVENTS_T, "tag", '"timestamp"::VARCHAR'),
        sf_dir,
    )


def test_hll_accuracy_against_exact(spark, tsdb):
    """m = 256 gives ~1.04/sqrt(m) = 6.5% standard error; assert every
    per-tag estimate lands within 3 sigma (20%) of the exact NDV."""
    exact = {
        r["tag"]: r["n"]
        for r in tsdb.groupBy("tag")
        .agg(F.countDistinct("timestamp").alias("n"))
        .collect()
    }
    est = {
        r["key"]: r["ndv_est"]
        for r in sketches.hll_ndv(
            tsdb, "tag", F.col("timestamp").cast("string")
        ).collect()
    }
    assert set(est) == set(exact)
    for tag, n in exact.items():
        assert abs(est[tag] - n) / n < 0.20, (tag, est[tag], n)


def test_hll_registers_merge_by_max(spark, tsdb):
    """Sketch property: registers built on two disjoint halves of the
    data, merged by per-bucket max, must equal the registers built on
    the whole — so partitioned scans / streaming micro-batches can
    each sketch locally and combine without rescanning."""
    val = F.col("timestamp").cast("string")
    whole = sketches.hll_registers(tsdb, "tag", val)
    h1 = sketches.hll_registers(tsdb.filter("timestamp % 2 = 0"), "tag", val)
    h2 = sketches.hll_registers(tsdb.filter("timestamp % 2 = 1"), "tag", val)
    merged = (
        h1.unionByName(h2)
        .groupBy("key", "bucket")
        .agg(F.max("m").alias("m"))
    )
    a = {(r["key"], r["bucket"]): r["m"] for r in whole.collect()}
    b = {(r["key"], r["bucket"]): r["m"] for r in merged.collect()}
    assert a == b
    # and the merged estimate equals the whole-data estimate
    ea = {r["key"]: r["ndv_est"] for r in sketches.hll_estimate(whole).collect()}
    eb = {r["key"]: r["ndv_est"] for r in sketches.hll_estimate(merged).collect()}
    assert ea == eb


def test_hll_linear_counting_guard_band_exhaustive():
    """The linear-counting branch computes 256·ln(256/z) for z in
    {1..255} — enumerate ALL of them and assert each quantizes at least
    1e-6 away from a round(·, 4) half-boundary, so a ~1 ulp libm
    difference can never flip the gate hash on ANY input, current or
    future."""
    for z in range(1, 256):
        v = 256.0 * math.log(256.0 / z)
        frac = abs(((v * 10_000.0) % 1.0) - 0.5)
        assert frac > 1e-6, (z, v, frac)


def test_hll_raw_branch_guard_band_fixture(spark, tsdb):
    """Raw-branch twin of the LM guard band: the fixture tags' harmonic
    estimates must also sit clear of their rounding boundaries."""
    regs = sketches.hll_registers(
        tsdb, "tag", F.col("timestamp").cast("string")
    ).collect()
    by_key: dict = {}
    for r in regs:
        by_key.setdefault(r["key"], {})[r["bucket"]] = r["m"]
    for key, m in by_key.items():
        zeros = 256 - len(m)
        s = zeros * (1 << 53) + sum(1 << (53 - v) for v in m.values())
        raw = sketches.HLL_ALPHA * 256.0 * 256.0 * float(1 << 53) / float(s)
        if raw <= 640.0 and zeros > 0:
            v = 256.0 * math.log(256.0 / zeros)
        else:
            v = raw
        frac = abs(((v * 10_000.0) % 1.0) - 0.5)
        assert frac > 1e-6, (key, v, frac)


def test_hll_small_set_linear_counting(spark):
    """Tiny inputs take the linear-counting branch and stay accurate:
    20 distinct values must estimate within 15%."""
    df = spark.createDataFrame(
        [(i % 20, "a") for i in range(200)], "v long, tag string"
    )
    est = sketches.hll_ndv(df, "tag", F.col("v").cast("string")).collect()
    assert len(est) == 1
    assert abs(est[0]["ndv_est"] - 20) / 20 < 0.15, est[0]["ndv_est"]


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_matches_oracle(spark, sf_dir):
    from timeseries_db_spark.operators import text
    from timeseries_db_spark.operators.text import TOKENS_SPARK
    from timeseries_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.expr(TOKENS_SPARK)).alias("token")).filter(
        "token <> ''"
    )
    counters = sketches.cms_counters(tok, F.col("token"))
    got = sketches.cms_estimate(counters, text.vocab_topn(docs, 100), "token")
    check_against_duckdb(
        got, sketches.cms_token_estimates_sql(text.vocab_topn_sql(100)), sf_dir
    )


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """5000 distinct values into w = 1024 counters FORCES collisions:
    every estimate must still be >= the true count (the CMS guarantee),
    and the min-over-4-rows must keep the overcount below the eN/w
    Markov bound with room to spare."""
    import random

    rng = random.Random(42)
    rows = [(f"v{i}",) for i in range(5000) for _ in range(rng.randint(1, 5))]
    df = spark.createDataFrame(rows, "v string")
    n_total = len(rows)
    counters = sketches.cms_counters(df, F.col("v"))
    items = spark.createDataFrame(
        [(f"v{i}",) for i in range(0, 5000, 50)], "v string"
    )
    est = {
        r["item"]: r["est"]
        for r in sketches.cms_estimate(counters, items, "v").collect()
    }
    from collections import Counter

    true = Counter(v for (v,) in rows)
    overs = []
    for item, e in est.items():
        assert e >= true[item], (item, e, true[item])
        overs.append(e - true[item])
    assert max(overs) > 0  # collisions really happened at this density
    bound = 2.718 * n_total / sketches.CMS_W
    assert max(overs) <= bound, (max(overs), bound)


def test_cms_counters_merge_by_addition(spark, sf_dir):
    """Two disjoint halves' counter tables, summed per (row, idx), must
    equal the whole-data counters — the mergeability that lets each
    micro-batch/partition sketch locally."""
    from timeseries_db_spark.operators.text import TOKENS_SPARK
    from timeseries_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("token")
    ).filter("token <> ''")
    whole = sketches.cms_counters(tok, F.col("token"))
    h1 = sketches.cms_counters(tok.filter("doc_id % 2 = 0"), F.col("token"))
    h2 = sketches.cms_counters(tok.filter("doc_id % 2 = 1"), F.col("token"))
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r["row"], r["idx"]): r["cnt"] for r in whole.collect()}
    b = {(r["row"], r["idx"]): r["cnt"] for r in merged.collect()}
    assert a == b


def test_cms_counters_weighted_equals_occurrence_stream(spark, sf_dir):
    """Counters built from a pre-aggregated (token, freq) table with
    weight_col must be IDENTICAL to counters over the raw occurrence
    stream — the additivity that lets the vocab entry share one
    tokenize pass between the vocabulary and the sketch."""
    from timeseries_db_spark.operators.text import TOKENS_SPARK, token_counts
    from timeseries_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.expr(TOKENS_SPARK)).alias("token")
    ).filter("token <> ''")
    occ = sketches.cms_counters(tok, F.col("token"))
    wtd = sketches.cms_counters(
        token_counts(docs), F.col("token"), weight_col="freq"
    )
    a = {(r["row"], r["idx"]): r["cnt"] for r in occ.collect()}
    b = {(r["row"], r["idx"]): r["cnt"] for r in wtd.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Streaming HLL maintenance
# ---------------------------------------------------------------------------


def test_streaming_hll_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Drive the fixture through 3 micro-batches; the maintained
    register state must equal the batch sketch of all data, and the
    live estimate must equal the batch estimate. Then deliver a 4th
    file from the SAME checkpoint (restart) and assert the state folds
    it in — the crash/resume shape of the ingest path."""
    from timeseries_db_spark.streaming import sketches as ssk

    pdf = (
        events_as_tsdb(spark, sf_dir)
        .select("timestamp", "tag", "value")
        .toPandas()
        .sort_values(["timestamp", "tag"])
        .reset_index(drop=True)
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    import time as _time

    thirds = np.array_split(pdf, 3)
    for i, part in enumerate(thirds):
        part.to_parquet(in_dir / f"b{i}.parquet", index=False)
        _time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    def run_stream():
        stream = (
            spark.readStream.schema("timestamp long, tag string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(in_dir))
        )
        q = ssk.start_hll_maintenance(
            stream,
            "tag",
            F.col("timestamp").cast("string"),
            str(tmp_path / "state"),
            str(tmp_path / "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_stream()
    whole = spark.createDataFrame(pdf)
    batch_regs = {
        (r["key"], r["bucket"]): r["m"]
        for r in sketches.hll_registers(
            whole, "tag", F.col("timestamp").cast("string")
        ).collect()
    }
    state = ssk.read_hll_state(spark, str(tmp_path / "state"))
    stream_regs = {(r["key"], r["bucket"]): r["m"] for r in state.collect()}
    assert stream_regs == batch_regs
    ea = {
        r["key"]: r["ndv_est"]
        for r in sketches.hll_estimate(state).collect()
    }
    eb = {
        r["key"]: r["ndv_est"]
        for r in sketches.hll_ndv(
            whole, "tag", F.col("timestamp").cast("string")
        ).collect()
    }
    assert ea == eb

    # restart from the same checkpoint with one more file present
    extra = pdf.head(50).copy()
    extra["timestamp"] = extra["timestamp"] + 999_999_937  # novel values
    extra.to_parquet(in_dir / "b3.parquet", index=False)
    run_stream()
    grown = spark.createDataFrame(pd.concat([pdf, extra]))
    batch2 = {
        (r["key"], r["bucket"]): r["m"]
        for r in sketches.hll_registers(
            grown, "tag", F.col("timestamp").cast("string")
        ).collect()
    }
    state2 = {
        (r["key"], r["bucket"]): r["m"]
        for r in ssk.read_hll_state(spark, str(tmp_path / "state")).collect()
    }
    assert state2 == batch2
    # pruning bounds retained state at two generations
    import os

    vs = [
        e
        for e in os.listdir(tmp_path / "state")
        if e.startswith("v")
    ]
    assert len(vs) <= 2, vs


# ---------------------------------------------------------------------------
# Hypothesis fuzz (no SparkSession): the register decomposition math
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=1000, deadline=None)
@given(h=st.integers(min_value=0, max_value=(1 << 60) - 1))
def test_hll_rho_bitlen_formula(h):
    """The engines compute rho from the LENGTH OF THE BINARY STRING
    (conv/bin) — fuzz that formula against int.bit_length() over the
    whole 60-bit hash domain, including rest == 0 and powers of two."""
    rest = h >> sketches.HLL_P
    if rest == 0:
        rho = 53
    else:
        rho = 53 - len(bin(rest)[2:])
    assert rho == 53 - rest.bit_length() if rest else rho == 53
    # rho is the leading-zero count of the 52-bit field plus one
    assert 1 <= rho <= 53
    if rest:
        assert rest < (1 << (53 - rho)) and rest >= (1 << (52 - rho))


# ---------------------------------------------------------------------------
# Fixed-grid histogram quantiles
# ---------------------------------------------------------------------------

HIST_LO, HIST_HI = 0.0, 500.0


def test_histogram_quantiles_match_oracle(spark, sf_dir, tsdb):
    got = (
        sketches.histogram_quantile(
            sketches.histogram_counts(tsdb, "tag", "value", HIST_LO, HIST_HI),
            0.5,
            HIST_LO,
            HIST_HI,
        )
        .withColumn("q", F.lit(0.5))
        .select("key", "q", "est")
    )
    check_against_duckdb(
        got,
        sketches.histogram_quantiles_sql(
            EVENTS_T, "tag", "value", HIST_LO, HIST_HI, (0.5,)
        ),
        sf_dir,
    )


def test_histogram_quantile_within_one_bucket_of_nearest_rank(spark, tsdb):
    """The sketch's guarantee: the q-estimate lies within ONE bucket
    width of the exact ceil(q*n)-th order statistic (NOT of the
    interpolated percentile — adjacent ranks can jump many buckets in
    sparse regions, which is the estimator's honest definition)."""
    hist = sketches.histogram_counts(tsdb, "tag", "value", HIST_LO, HIST_HI)
    width = (HIST_HI - HIST_LO) / sketches.HIST_BUCKETS
    pdf = tsdb.select("tag", "value").toPandas()
    for q in (0.05, 0.5, 0.95):
        est = {
            r["key"]: r["est"]
            for r in sketches.histogram_quantile(
                hist, q, HIST_LO, HIST_HI
            ).collect()
        }
        for tag, g in pdf.groupby("tag"):
            vs = sorted(g["value"])
            true = vs[math.ceil(q * len(vs)) - 1]
            assert abs(est[tag] - true) <= width, (q, tag, est[tag], true)


def test_histogram_counts_merge_by_addition(spark, tsdb):
    whole = sketches.histogram_counts(tsdb, "tag", "value", HIST_LO, HIST_HI)
    h1 = sketches.histogram_counts(
        tsdb.filter("timestamp % 2 = 0"), "tag", "value", HIST_LO, HIST_HI
    )
    h2 = sketches.histogram_counts(
        tsdb.filter("timestamp % 2 = 1"), "tag", "value", HIST_LO, HIST_HI
    )
    merged = (
        h1.unionByName(h2).groupBy("key", "b").agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r["key"], r["b"]): r["cnt"] for r in whole.collect()}
    b = {(r["key"], r["b"]): r["cnt"] for r in merged.collect()}
    assert a == b


def test_histogram_out_of_range_clamps(spark):
    """Values outside [lo, hi) clamp into the edge buckets — mass is
    preserved (total == n) and the extreme quantiles degrade to the
    grid bounds instead of dropping rows."""
    df = spark.createDataFrame(
        [(float(v), "a") for v in (-50, -1, 0, 250, 499, 600, 1e9)],
        "value double, tag string",
    )
    hist = sketches.histogram_counts(df, "tag", "value", HIST_LO, HIST_HI)
    rows = hist.collect()
    assert sum(r["cnt"] for r in rows) == 7
    bs = {r["b"] for r in rows}
    assert 0 in bs and sketches.HIST_BUCKETS - 1 in bs


def test_streaming_cms_and_histogram_maintenance(spark, sf_dir, tmp_path):
    """The generic maintenance harness holds for add-merged sketches
    too: a 3-micro-batch CMS counter stream and histogram stream must
    each equal their batch twins."""
    from timeseries_db_spark.streaming import sketches as ssk

    pdf = (
        events_as_tsdb(spark, sf_dir)
        .select("timestamp", "tag", "value")
        .toPandas()
        .sort_values(["timestamp", "tag"])
        .reset_index(drop=True)
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    import time as _time

    for i, part in enumerate(np.array_split(pdf, 3)):
        part.to_parquet(in_dir / f"b{i}.parquet", index=False)
        _time.sleep(1.1)

    def stream():
        return (
            spark.readStream.schema("timestamp long, tag string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(in_dir))
        )

    q1 = ssk.start_cms_maintenance(
        stream(),
        F.col("tag"),
        str(tmp_path / "cms_state"),
        str(tmp_path / "cms_ckpt"),
    )
    q2 = ssk.start_histogram_maintenance(
        stream(),
        "tag",
        "value",
        0.0,
        500.0,
        str(tmp_path / "h_state"),
        str(tmp_path / "h_ckpt"),
    )
    # one try/finally over BOTH queries: a failure in q1's micro-batch
    # must not leak q2 running for the rest of the shared session
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        try:
            q1.stop()
        finally:
            q2.stop()

    whole = spark.createDataFrame(pdf)
    cms_batch = {
        (r["row"], r["idx"]): r["cnt"]
        for r in sketches.cms_counters(whole, F.col("tag")).collect()
    }
    cms_stream = {
        (r["row"], r["idx"]): r["cnt"]
        for r in ssk.read_sketch_state(
            spark, str(tmp_path / "cms_state"), "row int, idx bigint, cnt bigint"
        ).collect()
    }
    assert cms_stream == cms_batch
    h_batch = {
        (r["key"], r["b"]): r["cnt"]
        for r in sketches.histogram_counts(
            whole, "tag", "value", 0.0, 500.0
        ).collect()
    }
    h_stream = {
        (r["key"], r["b"]): r["cnt"]
        for r in ssk.read_sketch_state(
            spark, str(tmp_path / "h_state"), "key string, b int, cnt bigint"
        ).collect()
    }
    assert h_stream == h_batch


def test_hll_overlap_set_algebra(spark):
    """Set operations over one register table: identical sets intersect
    at ~their own NDV, disjoint sets at ~0 (floored), and a planted
    half-overlap estimates within sketch error; every union estimate
    matches the estimate of the actual set union (register-max merge is
    EXACT, so union error is just single-sketch error)."""
    import pandas as pd

    n = 4000
    rows = (
        [("a", f"v{i}") for i in range(n)]            # a: 0..3999
        + [("b", f"v{i}") for i in range(n)]          # b == a
        + [("c", f"w{i}") for i in range(n)]          # c disjoint from a
        + [("d", f"v{i}") for i in range(n // 2, n)]  # d = upper half of a
        + [("d", f"x{i}") for i in range(n // 2)]
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "val"]))
    regs = sketches.hll_registers(df, "key", F.col("val"))
    ov = {
        r["key"]: (r["ndv_a"], r["ndv_b"], r["union_est"], r["inter_est"])
        for r in sketches.hll_overlap(
            regs, [("a", "b"), ("a", "c"), ("a", "d")]
        ).collect()
    }
    ndv_a, _, union_ab, inter_ab = ov["a|b"]
    # identical: union == each side's estimate exactly (same registers)
    assert union_ab == ndv_a and inter_ab == ndv_a
    _, ndv_c, union_ac, inter_ac = ov["a|c"]
    # disjoint: union ~ 2n, intersection ~ 0 (3-sigma of the union)
    assert abs(union_ac - 2 * n) / (2 * n) < 0.20
    assert inter_ac < 0.20 * 2 * n
    _, ndv_d, union_ad, inter_ad = ov["a|d"]
    # half overlap: |a ∪ d| = 1.5n, |a ∩ d| = 0.5n (wider band: I-E
    # stacks three estimates' errors)
    assert abs(union_ad - 1.5 * n) / (1.5 * n) < 0.20
    assert abs(inter_ad - 0.5 * n) / (0.5 * n) < 0.60


def test_hll_union_equals_direct_estimate_hypothesis(spark):
    """Register-max union is EXACT: for random value sets A and B, the
    pair's union estimate equals hll_ndv run directly on A ∪ B — not
    approximately, identically (same registers → same estimate)."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        a=st.sets(st.integers(min_value=0, max_value=5000), min_size=1, max_size=400),
        b=st.sets(st.integers(min_value=0, max_value=5000), min_size=1, max_size=400),
    )
    def run(a, b):
        rows = [("a", f"v{x}") for x in a] + [("b", f"v{x}") for x in b]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "val"]))
        regs = sketches.hll_registers(df, "key", F.col("val"))
        union_est = {
            r["key"]: r["union_est"]
            for r in sketches.hll_overlap(regs, [("a", "b")]).collect()
        }["a|b"]
        direct = spark.createDataFrame(
            pd.DataFrame(
                [("u", f"v{x}") for x in (a | b)], columns=["key", "val"]
            )
        )
        direct_est = sketches.hll_ndv(direct, "key", F.col("val")).collect()[0][
            "ndv_est"
        ]
        assert union_est == direct_est, (union_est, direct_est)

    run()
