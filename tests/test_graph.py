"""Connected components / dedup clustering (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseries_db_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    dedup_clusters_sql,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r["id"], r["component"])
        for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_chain_converges_via_pointer_jumping(spark):
    # a 24-vertex path: worst case for pure propagation (diameter 23);
    # pointer jumping must close it well inside the iteration cap
    n = 24
    got = _cc(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {(i, 0) for i in range(n)}


def test_direction_and_duplicates_irrelevant(spark):
    got = _cc(spark, [(5, 4), (4, 5), (4, 3), (5, 3), (3, 4)])
    assert got == {(3, 3), (4, 3), (5, 3)}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_against_oracle(spark, sf_dir):
    from tests.oracle import check_against_duckdb
    from timeseries_db_spark.registry_ext import JACCARD_T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    check_against_duckdb(
        dedup_clusters(docs, JACCARD_T), dedup_clusters_sql(JACCARD_T), sf_dir
    )


def test_dedup_clusters_shape(spark, sf_dir):
    from timeseries_db_spark.registry_ext import JACCARD_T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup_clusters(docs, JACCARD_T)
    rows = out.collect()
    assert rows, "fixture corpus has near-dup pairs, clusters expected"
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m["doc_id"] for m in members)
        assert cid == ids[0], "cluster_id must be the min member id"
        assert all(m["cluster_size"] == len(members) for m in members)
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1 and keeps[0]["doc_id"] == cid
        assert len(members) >= 2, "every emitted vertex came from a pair"


def test_dedup_keep_best_keeps_highest_quality(spark, sf_dir):
    """Keep-best selects exactly one survivor per cluster, and it is a
    max-quality member (ties to smallest doc_id); cluster memberships
    are identical to the min-id rule's."""
    from timeseries_db_spark.operators.graph import dedup_clusters, dedup_keep_best
    from timeseries_db_spark.sources.tables import load_table

    minid = dedup_clusters(load_table(spark, sf_dir, "documents"), 0.8)
    best = dedup_keep_best(load_table(spark, sf_dir, "documents"), 0.8)
    mrows = {r["doc_id"]: r["cluster_id"] for r in minid.collect()}
    brows = best.collect()
    assert {r["doc_id"]: r["cluster_id"] for r in brows} == mrows
    by_cluster = {}
    for r in brows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1, cid
        qmax = max(m["quality"] for m in members)
        assert keeps[0]["quality"] == qmax
        ties = [m["doc_id"] for m in members if m["quality"] == qmax]
        assert keeps[0]["doc_id"] == min(ties)


def test_pagerank_matches_python_twin_and_ranks_hubs(spark):
    """r9 exact-integer PageRank: the distributed result must equal a
    pure-Python replay of the micro-unit update rule bit-for-bit, and a
    hub (connected to everything) must outrank leaf nodes."""
    from timeseries_db_spark.operators.graph import (
        PR_BASE,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_UNIT,
        pagerank,
    )

    # star + tail: 0 is a hub over 1..5; 6-7-8 a chain
    und = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8)]
    both = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(both, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}

    # pure-Python twin
    from collections import defaultdict

    adj = defaultdict(list)
    for a, b in both:
        adj[a].append(b)
    rank = {n: PR_UNIT for n in adj}
    for _ in range(3):
        s = defaultdict(int)
        for u, outs in adj.items():
            c = rank[u] // len(outs)
            for v in outs:
                s[v] += c
        rank = {
            n: PR_BASE + (PR_DAMP_NUM * s.get(n, 0)) // PR_DAMP_DEN for n in adj
        }
    assert got == rank
    assert got[0] > max(got[i] for i in range(1, 6))  # hub beats leaves
    assert got[7] > got[6] == got[8]  # chain middle beats symmetric ends
    # determinism: a second run is bit-identical
    assert {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()} == got
