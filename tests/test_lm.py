"""Char-trigram LM quality scoring: DuckDB oracle mirror, the
fixed-point rounding guard band (the cross-engine libm-ln hazard the
round-6 ADVICE flagged for IVF applies here too), cross-corpus backoff
semantics, and the CCNet-style discrimination property the operator
exists for — natural text must outscore shuffled garbage."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timeseries_db_spark.operators import lm
from timeseries_db_spark.sources.tables import load_table

from tests.oracle import check_against_duckdb


def test_lm_score_matches_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    check_against_duckdb(lm.lm_score(docs), lm.lm_score_sql(), sf_dir)


def test_lm_fp_quantization_guard_band(spark, sf_dir):
    """No quantized log-prob may sit near a .5 rounding boundary: the
    two engines compute ln() with independent libms that can differ by
    ~1 ulp (≈1e-10 after the 1e6 scaling), so a value within that band
    could round differently and flip the driver's value hash. Assert
    every distinct (tri_cnt+1)/(bi_cnt+V) ratio in the fixture
    quantizes at least 1e-3 away from a boundary — five orders of
    magnitude of headroom."""
    docs = load_table(spark, sf_dir, "documents")
    model = lm.char_trigram_model(docs)
    tc = (
        lm._doc_trigrams(docs)
        .groupBy("tri")
        .agg(F.count("*").alias("tri_cnt"))
    )
    rows = (
        model.join(tc, "tri")
        .select("tri_cnt", "bi_cnt")
        .crossJoin(
            tc.select(
                F.countDistinct(F.expr("substring(tri, 3, 1)")).alias("vsize")
            )
        )
        .distinct()
        .collect()
    )
    assert rows
    worst = 1.0
    for r in rows:
        x = lm.LM_FP_SCALE * math.log(
            (r["tri_cnt"] + 1) / (r["bi_cnt"] + r["vsize"])
        )
        dist = abs(abs(x - math.floor(x)) - 0.5)
        worst = min(worst, dist)
    assert worst > 1e-3, f"log-prob too close to rounding boundary: {worst}"


def test_lm_discriminates_natural_from_garbage(spark):
    """The point of an LM filter: under a model fitted on natural text,
    natural held-out text scores higher (less negative avg log-prob)
    than character-shuffled garbage of the same length."""
    base = (
        "the quick brown fox jumps over the lazy dog and the cat sat on "
        "the mat while the dog ran through the park in the morning light "
    )
    ref = spark.createDataFrame(
        [(i, base) for i in range(20)], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [
            (100, "the dog sat on the mat in the park"),
            (101, "tkh gqd zbo ntx mjw vqe hlc prs fyu"),
        ],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.lm_score(probe, ref=ref).collect()
    }
    assert scores[100] > scores[101] + 1.0, scores


def test_lm_cross_ref_backoff_no_drops(spark):
    """Scoring against a DIFFERENT reference corpus must keep every
    document and every trigram (left join + smoothed floor), never
    silently drop unseen trigrams."""
    ref = spark.createDataFrame(
        [(1, "aaaa bbbb cccc")], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(2, "zzzz yyyy xxxx"), (3, "aaaa bbbb")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm.lm_score(probe, ref=ref).collect()}
    assert set(out) == {2, 3}
    # "zzzz yyyy xxxx" prepped length 14 → 12 trigrams, all unseen
    assert out[2]["n_tri"] == 12
    assert out[2]["score_fp"] < 0
    # unseen text must score strictly worse than in-reference text
    assert out[3]["avg_logprob"] > out[2]["avg_logprob"]


def test_lm_backoff_uses_seen_bigram_context(spark):
    """An unseen trigram whose bigram CONTEXT the reference has seen
    must back off to 1/(bi_cnt + V) with the context's real count —
    not the unseen-context floor 1/V. Hand-computed: ref 'aaab' has
    trigrams {aaa, aab}, context 'aa' count 2, alphabet {a, b} so
    V = 2; probe 'aaac' scores seen 'aaa' at ln(2/4) and unseen 'aac'
    at ln(1/(2+2)) — NOT ln(1/(0+2))."""
    import math

    ref = spark.createDataFrame([(1, "aaab")], "doc_id long, text string")
    probe = spark.createDataFrame([(2, "aaac")], "doc_id long, text string")
    row = lm.lm_score(probe, ref=ref).collect()[0]
    fp = lambda x: int(  # noqa: E731 — duck_round(·, 0) on a negative
        -math.floor(-lm.LM_FP_SCALE * x + 0.5)
    )
    expected = fp(math.log((1 + 1) / (2 + 2))) + fp(math.log(1.0 / (2 + 2)))
    assert row["n_tri"] == 2
    assert row["score_fp"] == expected, (row["score_fp"], expected)


def test_lm_model_bounded_and_broadcast(spark, sf_dir):
    """Scale posture: the model table is bounded by the alphabet and
    the scoring join must broadcast it (no corpus-sized shuffle on the
    join key)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        lm.lm_score(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_lm_xcorpus_matches_oracle(spark, sf_dir):
    """Cross-corpus (backoff-firing) leg vs its DuckDB twin: fit on the
    deterministic train split, score the valid split — the gate shape of
    text_lm_score's `xcorpus` leg."""
    from timeseries_db_spark.operators.corpus import _split_col, _split_sql

    docs = load_table(spark, sf_dir, "documents")
    split = _split_col(F.col("doc_id"))
    got = lm.lm_score(
        docs.filter(split == "valid"), ref=docs.filter(split == "train")
    )
    pred = _split_sql("doc_id")
    check_against_duckdb(
        got,
        lm.lm_score_xcorpus_sql(
            f"(SELECT * FROM documents WHERE {pred} = 'train')",
            f"(SELECT * FROM documents WHERE {pred} = 'valid')",
        ),
        sf_dir,
    )


def test_lm_backoff_floor_quantization_guard_band(spark, sf_dir):
    """Extends the fixed-point guard band to the BACKOFF floor values the
    xcorpus leg actually quantizes: for every bigram context count c the
    fitted (train-split) model can supply — including the unseen-context
    c = 0 — the floor 1e6·ln(1/(c+V)) must land at least 1e-3 away from
    a .5 rounding boundary, so a ~1e-10 cross-engine ln() divergence
    cannot flip a rounded BIGINT summand."""
    from timeseries_db_spark.operators.corpus import _split_col

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(_split_col(F.col("doc_id")) == "train")
    model = lm.char_trigram_model(train)
    ctx = [0] + [
        r["bi_cnt"] for r in model.select("bi_cnt").distinct().collect()
    ]
    vsize = (
        lm._doc_trigrams(train)
        .select(F.countDistinct(F.expr("substring(tri, 3, 1)")).alias("v"))
        .collect()[0]["v"]
    )
    assert len(ctx) > 1 and vsize > 0
    worst = 1.0
    for c in ctx:
        x = lm.LM_FP_SCALE * math.log(1.0 / (c + vsize))
        worst = min(worst, abs(abs(x - math.floor(x)) - 0.5))
    assert worst > 1e-3, f"backoff floor too close to rounding boundary: {worst}"


def test_lm_partition_terciles(spark, sf_dir):
    """Rank-based CCNet buckets: equal-count (±1) buckets, bucket 1
    holds the highest (most fluent) scores, and the DuckDB twin
    reproduces the assignment exactly (exact-BIGINT total order)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = lm.lm_score(docs)
    part = lm.lm_partition(scored)
    rows = part.join(scored, "doc_id").select("doc_id", "bucket", "score_fp").collect()
    n = len(rows)
    sizes = {b: sum(1 for r in rows if r["bucket"] == b) for b in (1, 2, 3)}
    assert sum(sizes.values()) == n and max(sizes.values()) - min(sizes.values()) <= 1
    worst_head = min(r["score_fp"] for r in rows if r["bucket"] == 1)
    best_tail = max(r["score_fp"] for r in rows if r["bucket"] == 3)
    assert worst_head >= best_tail
    check_against_duckdb(
        part, lm.lm_partition_sql(lm.lm_score_sql()), sf_dir
    )


def test_lm_partition_approx_agrees_with_exact(spark, sf_dir):
    """The sketch-boundary scale twin: no global sort in the assignment
    (map-only comparisons against collected boundary literals), bucket
    sizes near-equal, and >= 95% agreement with the exact ntile form —
    the drift lives only at boundary ties within the sketch's rank
    error."""
    docs = load_table(spark, sf_dir, "documents")
    scored = lm.lm_score(docs)
    exact = {
        r["doc_id"]: r["bucket"] for r in lm.lm_partition(scored).collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in lm.lm_partition_approx(scored).collect()
    }
    assert set(exact) == set(approx)
    n = len(exact)
    agree = sum(1 for d in exact if exact[d] == approx[d])
    assert agree >= 0.95 * n, f"agreement {agree}/{n}"
    from collections import Counter

    sizes = Counter(approx.values())
    assert set(sizes) == {1, 2, 3}
    assert max(sizes.values()) <= 1.2 * (n / 3)


def test_lm_partition_rank_bounds_override(spark):
    """r10 gate path: rank-exact boundary literals drive the same
    map-only assignment, with defined tie/short-corpus behavior —
    boundary-tied scores all fall to the less-fluent bucket, and a
    corpus smaller than n_buckets collapses deterministically."""
    mk = lambda scores: spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "doc_id long, score_fp long"
    )
    # 9 distinct scores 90..10: b = [40, 70] (ceil(k*9/3) = 3rd, 6th largest)
    nine = mk([90, 80, 70, 60, 50, 40, 30, 20, 10])
    assert lm.lm_partition_rank_bounds(nine) == [40, 70]
    got = {
        r["doc_id"]: r["bucket"]
        for r in lm.lm_partition_approx(nine, bounds=[40, 70]).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 2, 5: 3, 6: 3, 7: 3, 8: 3}
    # all-ties: both bounds equal the tied score -> everything bucket 3
    tied = mk([5, 5, 5, 5])
    b = lm.lm_partition_rank_bounds(tied)
    assert b == [5, 5]
    assert {
        r["bucket"] for r in lm.lm_partition_approx(tied, bounds=b).collect()
    } == {3}
    # n=1 < n_buckets: offsets collapse to rank 1 -> single doc in tail
    one = mk([42])
    b1 = lm.lm_partition_rank_bounds(one)
    assert b1 == [42, 42]
    assert [
        r["bucket"] for r in lm.lm_partition_approx(one, bounds=b1).collect()
    ] == [3]
    # empty: bounds [] and an empty assignment
    assert lm.lm_partition_rank_bounds(mk([])) == []
    assert lm.lm_partition_approx(mk([]), bounds=[]).count() == 0


def test_lm_partition_approx_empty_corpus(spark):
    """Empty input returns an empty frame, mirroring the exact form."""
    empty = spark.createDataFrame(
        [], "doc_id long, n_tri long, score_fp long, "
        "avg_logprob double, bits_per_char double"
    )
    assert lm.lm_partition_approx(empty).count() == 0
    assert lm.lm_partition(empty).count() == 0
