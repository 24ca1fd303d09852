"""Synthetic scaling-slope fixtures (sources/synth.py): the slope
measurement is only meaningful if the generators are deterministic and
their characteristics are scale-invariant."""

from pyspark.sql import functions as F

from timeseries_db_spark.sources import synth


def test_events_deterministic_and_shaped(spark):
    a = synth.synth_events(spark, 2_000).toPandas()
    b = synth.synth_events(spark, 2_000).toPandas()
    assert a.equals(b)
    assert list(a.columns) == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    assert set(a["event_type"]) == set(synth.EVENT_TYPES)
    # fixed window at any scale
    lo, hi = a["ts"].min(), a["ts"].max()
    assert (hi - lo).total_seconds() * 1000 < synth.EVENTS_SPAN_MS
    # constant per-user volume → user count scales with rows
    assert a["user_id"].nunique() == 2_000 // synth.EVENTS_PER_USER


def test_documents_deterministic_with_constant_dup_fraction(spark):
    docs = synth.synth_documents(spark, 2_000)
    a = docs.toPandas()
    assert a.equals(synth.synth_documents(spark, 2_000).toPandas())
    # every DUP_EVERY-th doc is a near-copy of its predecessor: same
    # word multiset except two perturbed positions → Jaccard well above
    # the registry's 0.8 threshold
    texts = dict(zip(a["doc_id"], a["text"]))
    n_dups = 0
    for i in range(synth.DUP_EVERY, 2_000, synth.DUP_EVERY):
        wa, wb = set(texts[i].split()), set(texts[i - 1].split())
        j = len(wa & wb) / len(wa | wb)
        assert j > 0.9, (i, j)
        n_dups += 1
    assert n_dups == 2_000 // synth.DUP_EVERY - 1
    # non-adjacent docs are NOT near-dups (distribution sanity)
    w0, w5 = set(texts[1].split()), set(texts[5].split())
    assert len(w0 & w5) / len(w0 | w5) < 0.5
    # n_chars matches the text (the real table's invariant)
    assert (a["n_chars"] == a["text"].str.len()).all()


def test_materialize_fixture_idempotent(spark, tmp_path):
    base = str(tmp_path)
    d1 = synth.materialize_fixture(spark, base, 500, 100)
    ev = spark.read.parquet(d1 + "/events.parquet")
    assert ev.count() == 500
    # marker short-circuits: second call returns without rewriting
    import os

    mtime = os.path.getmtime(d1 + "/_done")
    d2 = synth.materialize_fixture(spark, base, 500, 100)
    assert d2 == d1 and os.path.getmtime(d1 + "/_done") == mtime
    # gate callables run on the fixture dir unchanged
    from timeseries_db_spark.sources.tables import events_as_tsdb

    t = events_as_tsdb(spark, d1)
    assert t.count() == 500 and set(t.columns) >= {"timestamp", "tag", "value"}


def test_events_tiny_corpus_never_null_user_ids(spark):
    """r10 ADVICE: n_rows < EVENTS_PER_USER used to divide by zero in
    Spark's non-ANSI %, yielding silent NULL user_ids — the divisor now
    clamps to one user."""
    rows = synth.synth_events(spark, 10).collect()
    assert len(rows) == 10
    assert all(r["user_id"] == 0 for r in rows)


def test_embeddings_deterministic_clustered_scale_invariant(spark):
    """r11: the ANN slope entries are only meaningful if the embedding
    generator is deterministic, cluster-structured, and the cluster
    population fractions are scale-invariant (so a fixed nprobe/nlist
    probe prunes the same corpus fraction at every scale)."""
    a = synth.synth_embeddings(spark, 1_000).toPandas()
    b = synth.synth_embeddings(spark, 1_000).toPandas()
    assert list(a.columns) == ["vec_id", "embedding", "label"]
    assert all(len(e) == synth.EMB_DIM for e in a["embedding"])
    assert [list(x) for x in a["embedding"]] == [list(x) for x in b["embedding"]]
    # bounded components: center in [-1, 1], jitter ±0.4
    import numpy as np

    mat = np.stack(a["embedding"].to_numpy())
    assert float(np.abs(mat).max()) <= 2.2 + 1e-6  # center ±2 + jitter ±0.2
    # cluster structure: same-cluster vectors are much closer than
    # cross-cluster ones (this is what makes IVF pruning non-vacuous)
    def d(i, j):
        return float(np.linalg.norm(mat[i] - mat[j]))

    same = d(0, synth.EMB_CLUSTERS)  # both cluster 0
    cross = d(0, 1)
    assert same < cross / 2, (same, cross)
    # scale invariance: cluster population fraction is constant
    big = synth.synth_embeddings(spark, 4_000).toPandas()
    fa = (a["vec_id"] % synth.EMB_CLUSTERS == 0).mean()
    fb = (big["vec_id"] % synth.EMB_CLUSTERS == 0).mean()
    assert abs(fa - fb) < 0.01


def test_materialize_fixture_includes_embeddings(spark, tmp_path):
    d = synth.materialize_fixture(spark, str(tmp_path), 200, 50)
    emb = spark.read.parquet(d + "/embeddings.parquet")
    assert emb.count() == 50  # n_vecs defaults to n_docs
    assert set(emb.columns) == {"vec_id", "embedding", "label"}


def test_ivf_nlist_policy_balanced_lists_at_two_scales(spark):
    """r11 (VERDICT r10 item 8): the nlist ~ sqrt(N) policy keeps
    inverted-list populations balanced as the corpus grows — list
    sizes stay near N/nlist at both scales instead of one fixed nlist
    letting lists grow linearly."""
    import numpy as np

    from timeseries_db_spark.operators import similarity as sim

    assert sim.ivf_nlist_for(0) == 16
    assert sim.ivf_nlist_for(10_000) == 128      # sqrt = 100 -> 128
    assert sim.ivf_nlist_for(1_000_000) == 1024
    assert sim.ivf_nlist_for(10 ** 12) == 1 << 16  # upper clamp
    stats = {}
    for n in (2_000, 20_000):
        emb = synth.synth_embeddings(spark, n)
        nlist = sim.ivf_nlist_for(n)
        cents = sim.ivf_centroids(emb, nlist)
        ids, cmat = sim._collect_matrix(cents)
        order = np.argsort(ids, kind="stable")
        bc = spark.sparkContext.broadcast((ids[order], cmat[order]))
        assign = emb.select("vec_id", "embedding").mapInPandas(
            sim._ivf_assign_fn(bc, 1), schema="vec_id long, list_id long"
        )
        sizes = np.array(
            [r["c"] for r in assign.groupBy("list_id").agg(
                F.count("*").alias("c")).collect()]
        )
        stats[n] = (nlist, sizes)
        # balanced: the largest list stays within a small factor of the
        # mean (hash-sampled centroids over cluster-structured data)
        assert sizes.max() <= 10 * n / nlist, (n, nlist, sizes.max())
    # nlist grew with the corpus (the point of the policy): mean list
    # population is scale-stable instead of growing 10x
    (nl_s, sz_s), (nl_b, sz_b) = stats[2_000], stats[20_000]
    assert nl_b > nl_s
    assert sz_b.mean() < 4 * sz_s.mean()
