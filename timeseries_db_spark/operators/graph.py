"""Connected components over the near-duplicate pair graph — the step
that turns pairwise LSH output into dedup *decisions* (every doc in a
component is the "same" document; one canonical survivor is kept).

The reference has no graph surface (its whole query model is
filter→group→agg over one table, `Queries.hs:99-124`); this operator
belongs to the north-star LLM-pipeline surface: exact/MinHash/SimHash
dedup produce PAIRS, and a 100 TB pipeline must group those pairs into
clusters before it can drop duplicates.

Scale design
------------
Min-label propagation with pointer jumping (label(id) := label(label(id))
each round), the map-reduce connected-components recipe of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14):

* labels only ever DECREASE toward the component minimum, so the
  algorithm is deterministic and converges regardless of join order;
* one round = two keyed shuffles over the label table (|V| rows — the
  label table is vertices, not edges);
* pointer jumping gives O(log d) rounds for diameter d — the LSH pair
  graph has tiny components (near-dup clusters), so 2-3 rounds in
  practice;
* each round ends in ``localCheckpoint`` — iterative self-joins
  otherwise double the lineage/plan size per round, which is the
  classic Spark iterative-algorithm failure mode;
* convergence is detected from a changed-label flag carried through the
  checkpoint itself (``filter(chg).take(1)`` on the materialized vertex
  table — the driver-coordinated loop structure GraphX/Pregel uses,
  without a separate join-and-count action per round).

The DuckDB oracle is a recursive CTE computing the transitive closure
and taking min(reachable) per vertex — exact, so the driver's value
hash covers the full clustering, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(id, component) for every vertex of the undirected graph given by
    ``edges`` (columns ``src``, ``dst``); ``component`` is the smallest
    vertex id in the connected component — deterministic.

    Raises if ``max_iter`` rounds don't converge (with pointer jumping
    that would take a path component of length > 2**max_iter).
    """
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    # materialize the edge list ONCE — it is joined in every round, and
    # without the checkpoint each round re-runs the full upstream
    # pair-producing pipeline (for LSH input that is the whole
    # shingle→signature→band-join detector, measured ~2s/round at sf0.1)
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    labels = (
        bidir.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    if not labels.take(1):  # no edges → no clustered vertices
        return labels.select("id", F.col("label").alias("component"))

    for _ in range(max_iter):
        # min over neighbours' labels (one shuffle: join edges→labels on v,
        # aggregate by u)
        nbr_min = (
            bidir.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr"))
            .withColumnRenamed("u", "id")
        )
        cand = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.col("label").alias("old"),
                F.least(F.col("label"), F.coalesce(F.col("nbr"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # pointer jumping: label := label(label) (second shuffle)
        ptr = labels.select(
            F.col("id").alias("label"), F.col("label").alias("plabel")
        )
        # the changed flag rides along from cand's `old` column through
        # the checkpoint, so convergence detection is a filter+take on
        # the materialized vertex table — no extra join against the
        # previous labels, no second multi-shuffle action per round
        flagged = (
            cand.join(ptr, "label", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
                "old",
            )
            .select(
                "id", "label", (F.col("label") != F.col("old")).alias("chg")
            )
            .localCheckpoint()
        )
        labels = flagged.select("id", "label")
        if not flagged.filter("chg").take(1):
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def lsh_components(docs: DataFrame, threshold: float) -> DataFrame:
    """(id, component) over the MinHash-LSH pair graph — the shared
    iterative run both canonical-selection rules consume. The returned
    frame is materialized (per-round ``localCheckpoint``), so callers
    composing several rules over one clustering pass it to both instead
    of paying the loop twice."""
    from timeseries_db_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, threshold)
    return connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )


def dedup_clusters(
    docs: DataFrame, threshold: float, comp: DataFrame | None = None
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, keep) — near-dup clusters from
    the MinHash-LSH pair graph at ``threshold``; ``cluster_id`` is the
    smallest doc_id in the cluster and ``keep`` marks that canonical
    survivor. Only documents that appear in at least one pair are
    emitted (everything else is trivially its own singleton). Pass
    ``comp`` (a :func:`lsh_components` result) to reuse one components
    run across several selection rules."""
    if comp is None:
        comp = lsh_components(docs, threshold)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size"),
            (F.col("id") == F.col("component")).alias("keep"),
        )
    )


def dedup_clusters_sql(threshold: float) -> str:
    """DuckDB twin of :func:`dedup_clusters`: recursive transitive
    closure over the same LSH pair graph, min(reachable) per vertex."""
    from timeseries_db_spark.operators.dedup import minhash_lsh_pairs_sql

    return f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM ({minhash_lsh_pairs_sql(threshold)}) p),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT u AS id, u AS r FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
        ),
        comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        sized AS (
            SELECT id AS doc_id, cluster_id,
                   (count(*) OVER (PARTITION BY cluster_id))::BIGINT
                       AS cluster_size
            FROM comp
        )
        SELECT doc_id, cluster_id, cluster_size,
               doc_id = cluster_id AS keep
        FROM sized
    """


def dedup_keep_best(
    docs: DataFrame, threshold: float, comp: DataFrame | None = None
) -> DataFrame:
    """(doc_id, cluster_id, quality, keep) — quality-aware canonical
    selection: within each near-dup cluster the HIGHEST-quality member
    survives (ties break to the smallest doc_id), instead of
    :func:`dedup_clusters`' smallest-id rule. This is what production
    curation actually wants — when a document exists in several
    variants, keep the cleanest copy, not the one that happened to
    arrive first.

    Scale shape: the components run is identical (pass ``comp`` to
    share it with :func:`dedup_clusters`); the selection adds one
    quality join (per-doc rows) and one window over clusters —
    partitions are cluster-sized (tiny by near-dup construction)."""
    from pyspark.sql import Window

    from timeseries_db_spark.operators.text import quality_score

    if comp is None:
        comp = lsh_components(docs, threshold)
    q = quality_score(docs).select(F.col("doc_id").alias("id"), "quality")
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc("id")
    )
    return (
        comp.join(q, "id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "quality",
            "keep",
        )
    )


def dedup_keep_best_sql(threshold: float) -> str:
    """DuckDB twin: same recursive components + the same
    (quality DESC, doc_id) window rule."""
    from timeseries_db_spark.operators.dedup import minhash_lsh_pairs_sql
    from timeseries_db_spark.operators.text import quality_score_sql

    return f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM ({minhash_lsh_pairs_sql(threshold)}) p),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT u AS id, u AS r FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
        ),
        comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        q AS ({quality_score_sql()})
        SELECT comp.id AS doc_id, cluster_id, q.quality,
               row_number() OVER (
                   PARTITION BY cluster_id ORDER BY q.quality DESC, comp.id
               ) = 1 AS keep
        FROM comp JOIN q ON q.doc_id = comp.id
    """
