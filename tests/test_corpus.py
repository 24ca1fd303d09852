"""Corpus split + contamination: determinism, split-fraction sanity, the
DuckDB oracle mirror, and the broadcast-not-shuffle plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_db_spark.operators.corpus import (
    assign_splits,
    assign_splits_sql,
    benchmark_contamination,
    benchmark_contamination_sql,
    curation_topk,
    curation_topk_sql,
    pack_sequences,
    pack_sequences_sql,
    stratified_sample,
    stratified_sample_sql,
)
from timeseries_db_spark.sources.tables import load_table

from tests.oracle import check_against_duckdb
from tests.test_plans import _formatted_plan, _nodes


def test_split_matches_oracle(spark, sf_dir):
    df = assign_splits(load_table(spark, sf_dir, "documents"))
    check_against_duckdb(df, assign_splits_sql(), sf_dir)


def test_split_fractions_and_stability(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = dict(
        assign_splits(docs).groupBy("split").count().rdd.collectAsMap()
    )
    total = sum(counts.values())
    # md5 is uniform; at 500 docs allow wide but meaningful bands
    assert 0.70 <= counts["train"] / total <= 0.90, counts
    assert counts.get("valid", 0) > 0 and counts.get("test", 0) > 0, counts
    # pure function of the key: a second pass assigns identically
    a = assign_splits(docs).orderBy("doc_id").collect()
    b = assign_splits(docs).orderBy("doc_id").collect()
    assert a == b


def test_pack_matches_oracle(spark, sf_dir):
    df = pack_sequences(
        load_table(spark, sf_dir, "documents"), budget_tokens=512, shard_docs=100
    )
    check_against_duckdb(df, pack_sequences_sql(512, 100), sf_dir)


def test_pack_layout_invariants(spark, sf_dir):
    """Offsets stay inside the budget; consecutive docs in a shard are
    laid end-to-end: next.start == prev.start + prev.n_tokens."""
    rows = (
        pack_sequences(
            load_table(spark, sf_dir, "documents"),
            budget_tokens=512,
            shard_docs=100,
        )
        .orderBy("doc_id")
        .collect()
    )
    assert all(0 <= r["tok_offset"] < 512 for r in rows)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        start = 0
        for r in shard_rows:
            assert r["seq_id"] == start // 512 and r["tok_offset"] == start % 512
            start += r["n_tokens"]


def test_stratified_sample_matches_oracle(spark, sf_dir):
    fr = {"en": 0.6, "es": 1.0}
    df = stratified_sample(
        load_table(spark, sf_dir, "documents"), fr, default_fraction=0.25
    )
    check_against_duckdb(
        df, stratified_sample_sql(fr, default_fraction=0.25), sf_dir
    )


def test_stratified_sample_semantics(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fr = {"en": 0.6, "es": 1.0}
    kept = stratified_sample(docs, fr, default_fraction=0.25)
    # fraction 1.0 keeps the whole stratum
    n_es = docs.filter(F.col("lang") == "es").count()
    assert kept.filter(F.col("lang") == "es").count() == n_es
    # sampled strata land near their fraction (hash-uniform, small-n slack)
    for lang, frac in (("en", 0.6), (None, 0.25)):
        pred = (
            F.col("lang") == lang
            if lang
            else ~F.col("lang").isin("en", "es")
        )
        total, got = docs.filter(pred).count(), kept.filter(pred).count()
        assert abs(got / total - frac) < 0.15, (lang, got, total)
    # deterministic: a second invocation is set-identical
    again = stratified_sample(docs, fr, default_fraction=0.25)
    assert kept.exceptAll(again).count() == 0


def test_curation_topk_matches_oracle(spark, sf_dir):
    df = curation_topk(load_table(spark, sf_dir, "documents"), k=5)
    check_against_duckdb(df, curation_topk_sql(5), sf_dir)


def test_curation_topk_invariants(spark, sf_dir):
    rows = curation_topk(
        load_table(spark, sf_dir, "documents"), k=5
    ).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, grp in by_lang.items():
        grp.sort(key=lambda r: r["rnk"])
        assert len(grp) <= 5
        assert [r["rnk"] for r in grp] == list(range(1, len(grp) + 1))
        quals = [r["quality"] for r in grp]
        assert quals == sorted(quals, reverse=True), lang


def test_contamination_matches_oracle(spark, sf_dir):
    df = benchmark_contamination(load_table(spark, sf_dir, "documents"))
    check_against_duckdb(df, benchmark_contamination_sql(), sf_dir)


def test_contamination_counts_bounded_by_doc_shingles(spark, sf_dir):
    """n_shared can never exceed the doc's own distinct shingle count."""
    from timeseries_db_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    own = doc_shingles(docs).groupBy("doc_id").count()
    joined = benchmark_contamination(docs).join(own, "doc_id")
    bad = joined.filter(F.col("n_shared") > F.col("count")).count()
    assert bad == 0


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The train corpus must not shuffle on the shingle: the benchmark
    shingle set joins via BroadcastHashJoin."""
    docs = load_table(spark, sf_dir, "documents")
    plan = _formatted_plan(spark, benchmark_contamination(docs))
    assert len(_nodes(plan, "BroadcastHashJoin")) >= 1, plan
    # exactly two shuffle exchanges: the benchmark side's own distinct
    # (small by construction) and the final per-doc count — the TRAIN
    # shingle stream itself never hits an Exchange
    assert len(_nodes(plan, "Exchange")) == 2, plan


def test_curate_corpus_bookkeeping(spark, sf_dir):
    """The end-to-end curation verdict must be exactly reconstructible
    from its own bookkeeping columns, cover every input doc once, and
    agree with the standalone stages."""
    from pyspark.sql import functions as F

    from timeseries_db_spark.operators.corpus import curate_corpus
    from timeseries_db_spark.operators.graph import dedup_clusters
    from timeseries_db_spark.registry_ext import JACCARD_T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curate_corpus(docs, jaccard_threshold=JACCARD_T).collect()
    assert len(out) == docs.count()
    for r in out:
        expected = (
            r["quality"] >= 0.5
            and not r["is_dup_loser"]
            and (r["split"] != "train" or r["n_shared"] <= 3)
        )
        assert r["kept"] == expected, r
    # dup losers agree with the clustering operator
    losers = {
        r["doc_id"]
        for r in dedup_clusters(docs, JACCARD_T).filter("NOT keep").collect()
    }
    got_losers = {r["doc_id"] for r in out if r["is_dup_loser"]}
    assert got_losers == losers
    # something must be kept and something dropped on the fixture corpus
    kept = sum(1 for r in out if r["kept"])
    assert 0 < kept < len(out)


def test_chunk_documents_sliding_window_semantics(spark, sf_dir):
    """Chunk starts are multiples of stride below the token count; every
    chunk covers up to max_tokens with the remainder in the final one;
    consecutive chunks overlap by max_tokens - stride; token coverage is
    exactly [0, n_tokens)."""
    from timeseries_db_spark.operators.corpus import chunk_documents
    from timeseries_db_spark.operators.text import TOKENS_SPARK
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_tokens, stride = 128, 96
    chunks = chunk_documents(docs, max_tokens, stride).collect()
    n_tok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.expr(f"size({TOKENS_SPARK})").alias("n")
        ).collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every non-empty doc chunks; empty docs don't
    assert set(by_doc) == {d for d, n in n_tok.items() if n > 0}
    for doc_id, rows in by_doc.items():
        n = n_tok[doc_id]
        rows.sort(key=lambda r: r["chunk_idx"])
        expected_starts = list(range(0, n, stride))
        assert [r["tok_start"] for r in rows] == expected_starts
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        for r in rows:
            assert r["tok_len"] == min(max_tokens, n - r["tok_start"])
        # full coverage: the last chunk reaches exactly n
        assert rows[-1]["tok_start"] + rows[-1]["tok_len"] == n


def test_bloom_contamination_superset_of_exact(spark, sf_dir):
    """The join-free Bloom path may overcount (false positives) but can
    never miss: every document the exact broadcast-join detector flags
    must appear with n_flagged >= n_shared, and the total false-positive
    volume must stay within a loose multiple of the filter's fpp."""
    from timeseries_db_spark.operators.corpus import (
        benchmark_contamination,
        benchmark_contamination_bloom,
    )
    from timeseries_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r["doc_id"]: r["n_shared"]
        for r in benchmark_contamination(docs).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in benchmark_contamination_bloom(docs).collect()
    }
    assert exact, "fixture has no contamination to detect"
    # no false negatives: every exact hit present, never undercounted
    for doc_id, n in exact.items():
        assert bloom.get(doc_id, 0) >= n, (doc_id, n, bloom.get(doc_id))
    # bounded overcount: at 8 bits/item fpp ≈ 2-3%; allow generous slack
    # for the tiny fixture (the assertion is about ORDER of magnitude —
    # a broken filter flags nearly everything)
    extra_docs = set(bloom) - set(exact)
    assert len(extra_docs) <= max(10, 0.2 * len(bloom)), (
        len(extra_docs), len(bloom))


def test_source_reputation_semantics_and_oracle(spark, sf_dir):
    """Domain-level filtering: every document of a source shares the
    source's kept decision; a deliberately poisoned low-quality source
    is dropped wholesale even though the threshold is per-source mean,
    not per-doc; and the sf fixture matches the DuckDB twin."""
    from tests.oracle import check_against_duckdb
    from timeseries_db_spark.operators.corpus import (
        source_reputation,
        source_reputation_sql,
    )
    from timeseries_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = source_reputation(docs)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add((r["src_mean"], r["kept"]))
    # one (mean, decision) per source — per-doc rows never disagree
    assert all(len(v) == 1 for v in by_src.values())
    assert len(rows) == docs.count()
    check_against_duckdb(out, source_reputation_sql(), sf_dir)

    # poisoned source: junk docs (no stopwords, no alpha) drag the mean
    # below tau and take their individually-OK neighbor down with them
    junk = [(1000 + i, "000 111 222 333 444", "en", "spam", 19) for i in range(9)]
    # NULL-source docs must form their own reputation group, not vanish
    # from the result (review r8: an inner join never matches NULL keys)
    nosrc = [(1200, "the quick brown fox jumps over the lazy dog and runs on", "en", None, 56)]
    ok_doc = [(1009, "the quick brown fox jumps over the lazy dog", "en", "spam", 44)]
    good = [(1100 + i, "the quick brown fox jumps over the lazy dog and runs on", "en", "fine", 56) for i in range(10)]
    frame = spark.createDataFrame(
        junk + ok_doc + good + nosrc,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # tau between the two means (0.0554 vs 0.456): spam's nine junk
    # docs drag even its one individually-decent page below the bar
    rep = source_reputation(frame, min_mean_quality=0.25).collect()
    got = {(r["source"], r["kept"]) for r in rep}
    assert got == {("spam", False), ("fine", True), (None, True)}
    assert len(rep) == frame.count()  # every doc gets a decision


def test_training_pipeline_composition(spark, sf_dir):
    """End-to-end composition of the pipeline operators a training-data
    run chains in order — split → dedup-aware curation → LM tercile →
    source reputation → sequence packing — asserting the cross-operator
    invariants that make the composition sound: decisions are
    per-document consistent, stages only ever SHRINK the candidate set,
    every stage's keys exist in the previous stage's output, and the
    final packed layout covers exactly the surviving documents."""
    from pyspark.sql import functions as F

    from timeseries_db_spark.operators import corpus, lm
    from timeseries_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. deterministic split: total, disjoint
    splits = corpus.assign_splits(docs)
    assert splits.count() == n_docs
    assert splits.select("doc_id").distinct().count() == n_docs

    # 2. curation (quality + contamination + exact-dup losers) on train
    curated = corpus.curate_corpus(docs)
    kept1 = curated.filter("kept").select("doc_id")
    n1 = kept1.count()
    assert 0 < n1 < n_docs

    # 3. LM fluency cut: drop the tail tercile of the survivors
    scored = lm.lm_score(docs.join(kept1, "doc_id"))
    buckets = lm.lm_partition(scored)
    assert buckets.count() == n1
    kept2 = buckets.filter("bucket <= 2").select("doc_id")
    n2 = kept2.count()
    assert 0 < n2 < n1

    # 4. source reputation on the survivors: decisions total over input
    rep = corpus.source_reputation(docs.join(kept2, "doc_id"))
    assert rep.count() == n2
    kept3 = rep.filter("kept").select("doc_id")
    n3 = kept3.count()
    assert 0 < n3 <= n2

    # 5. pack the final set: every surviving doc lands in the layout
    packed = corpus.pack_sequences(docs.join(kept3, "doc_id"))
    assert packed.count() == n3
    assert packed.filter("tok_offset < 0").count() == 0
    # monotone shrink all the way down, and stage keys stay subsets
    assert n_docs > n1 > n2 >= n3
    orphans = kept3.join(kept1, "doc_id", "left_anti").count()
    assert orphans == 0


def test_weighted_sample_matches_oracle(spark, sf_dir):
    from timeseries_db_spark.operators.corpus import (
        weighted_sample,
        weighted_sample_sql,
    )

    df = weighted_sample(load_table(spark, sf_dir, "documents"), 25)
    check_against_duckdb(df, weighted_sample_sql(25), sf_dir)


def test_weighted_sample_semantics_and_guard_band(spark, sf_dir):
    """Exactly k per stratum; longer docs overrepresented vs uniform;
    deterministic; and the rounded-priority guard band: every priority
    at least 1e-4 quantum-units from a boundary, and each stratum's
    k-th/k+1-th gap far above cross-engine ln() noise."""
    import math

    from timeseries_db_spark.operators.corpus import (
        weighted_sample,
        weighted_sample_priority,
    )

    docs = load_table(spark, sf_dir, "documents")
    k = 25
    kept = weighted_sample(docs, k)
    per = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == k for n in per.values()), per
    # length bias: sampled docs are longer on average than the corpus
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_kept = (
        kept.join(docs, ["doc_id", "lang"]).agg(F.avg("n_chars")).first()[0]
    )
    assert mean_kept > mean_all, (mean_kept, mean_all)
    # determinism
    again = weighted_sample(docs, k)
    assert kept.exceptAll(again).count() == 0
    # guard band on the raw priorities (the ln() seam) — the SHARED
    # builder from corpus.py, so the margin check always covers the
    # shipped salt/offset/divisor
    pri = docs.select(
        "lang", weighted_sample_priority().alias("p")
    ).collect()
    by_lang: dict = {}
    for r in pri:
        v = r["p"]
        frac = abs(((v * 1e9) % 1.0) - 0.5)
        assert frac > 1e-4, (v, frac)
        by_lang.setdefault(r["lang"], []).append(math.floor(v * 1e9 + 0.5) / 1e9)
    for lang, vs in by_lang.items():
        vs.sort()
        gap = vs[k] - vs[k - 1]  # selection boundary
        assert gap > 1e-7, (lang, gap)


def test_mixture_resample_matches_oracle(spark, sf_dir):
    from timeseries_db_spark.operators.corpus import (
        mixture_resample,
        mixture_resample_sql,
    )

    targets = {"en": 300_000, "de": 200_000, "es": 200_000,
               "fr": 150_000, "zh": 150_000}
    df = mixture_resample(load_table(spark, sf_dir, "documents"), targets)
    check_against_duckdb(df, mixture_resample_sql(targets), sf_dir)


def test_mixture_resample_semantics(spark, sf_dir):
    """The surviving char mass must be ~proportional to the target mix:
    the binding stratum keeps everything (rate 1), every other
    stratum's realized share lands near its target (hash sampling is
    binomial — allow a generous tolerance at fixture size), and a
    stratum absent from the targets drops entirely."""
    from timeseries_db_spark.operators.corpus import mixture_resample

    docs = load_table(spark, sf_dir, "documents")
    targets = {"en": 300_000, "de": 200_000, "es": 200_000,
               "fr": 150_000, "zh": 150_000}
    kept = mixture_resample(docs, targets)
    mass = {
        r["lang"]: r["m"]
        for r in kept.join(docs, ["doc_id", "lang"])
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("m"))
        .collect()
    }
    total = sum(mass.values())
    assert set(mass) == set(targets)
    for lang, tppm in targets.items():
        share = mass[lang] / total
        assert abs(share - tppm / 1e6) < 0.08, (lang, share, tppm)
    # the binding (argmin actual/target) stratum keeps EVERY doc — the
    # downsample-only invariant, threshold pinned to 65536 so an IEEE
    # floor boundary can't shave off hash 65535 (code-review r8)
    masses = {
        r["lang"]: r["aw"]
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("aw")).collect()
    }
    binding = min(targets, key=lambda s: masses[s] / targets[s])
    assert (
        kept.filter(F.col("lang") == binding).count()
        == docs.filter(F.col("lang") == binding).count()
    ), binding
    # dropping a stratum from the targets removes it from the sample
    no_zh = mixture_resample(docs, {k: v for k, v in targets.items() if k != "zh"})
    assert no_zh.filter(F.col("lang") == "zh").count() == 0


def test_mixture_resample_hypothesis_cross_engine(spark):
    """Random tiny corpora + random integer targets: the Spark plan and
    the DuckDB twin must agree BITWISE on the kept set — the claim that
    identical double expression trees make the data-derived thresholds
    engine-exact, fuzzed across arbitrary (aw, tppm) ratios including
    floor-boundary-adjacent ones — and the binding stratum must always
    keep every doc (the pinned-threshold invariant)."""
    import duckdb

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from timeseries_db_spark.operators.corpus import (
        mixture_resample,
        mixture_resample_sql,
    )

    from tests.oracle import assert_same

    langs = ["aa", "bb", "cc"]

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(langs),
                st.integers(min_value=1, max_value=10**9),
            ),
            min_size=1,
            max_size=12,
        ),
        tppms=st.tuples(
            st.integers(min_value=1, max_value=10**6),
            st.integers(min_value=1, max_value=10**6),
            st.integers(min_value=1, max_value=10**6),
        ),
    )
    def run(rows, tppms):
        data = [
            (i, f"doc {i}", lang, "src", n)
            for i, (lang, n) in enumerate(rows)
        ]
        docs = spark.createDataFrame(
            data, "doc_id long, text string, lang string, source string, n_chars long"
        )
        targets = dict(zip(langs, tppms))
        got = mixture_resample(docs, targets)
        con = duckdb.connect()
        pdf = docs.toPandas()
        con.register("documents", pdf)
        exp = con.execute(mixture_resample_sql(targets)).df()
        assert_same(got, exp)
        # binding stratum keeps everything
        masses: dict = {}
        for _, (lang, n) in enumerate(rows):
            masses[lang] = masses.get(lang, 0) + n
        binding = min(masses, key=lambda s: masses[s] / targets[s])
        n_binding = sum(1 for lang, _ in rows if lang == binding)
        kept_binding = got.filter(F.col("lang") == binding).count()
        assert kept_binding == n_binding, (binding, kept_binding, n_binding)

    run()


def test_dq_report_detects_planted_violations(spark, tmp_path):
    """Each expectation fires on planted dirt: a NULL FK, a duplicate
    PK, an orphan lineitem, out-of-range quantity/discount, a NULL
    event value, and a duplicate event key."""
    import pandas as pd

    from timeseries_db_spark.operators.dq import dq_report

    base = tmp_path
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2, 2], "o_custkey": [10.0, None, 11.0]}
    )
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 99],        # 99 → orphan
            "l_quantity": [5.0, 0.0, 3.0],   # 0 → range violation
            "l_discount": [0.1, 1.5, -0.2],  # 1.5 and -0.2 → violations
        }
    )
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime([0, 0, 1_000, 2_000], unit="ms").astype(
                "datetime64[us]"
            ),
            # (0, x) duplicated; the NULL-key row must count as its own
            # distinct key (not get silently dropped by countDistinct)
            "event_type": ["x", "x", "y", None],
            "value": [1.0, None, 2.0, 3.0],
        }
    )
    for name, pdf in (("orders", orders), ("lineitem", li), ("events", ev)):
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            str(base / f"{name}.parquet")
        )
    got = {
        r["metric"]: r["value"] for r in dq_report(spark, str(base)).collect()
    }
    assert got["rows_orders"] == 3.0
    assert got["null_frac_o_custkey"] == round(1 / 3, 4)
    assert got["dup_pk_orders"] == 1.0
    assert got["orphan_lineitems"] == 1.0
    assert got["range_viol_l_quantity"] == 1.0
    assert got["range_viol_l_discount"] == 2.0
    assert got["null_events_value"] == 1.0
    assert got["dup_key_events"] == 1.0  # the NULL-key row is NOT a dup
    assert got["rows_events"] == 4.0
