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
    # eager=False: the blocks materialize inside round 1's aggregation
    # job (which computes every partition), saving a dedicated
    # checkpoint action while still truncating lineage for rounds ≥ 2.
    # r18 TRIED AND REVERTED: checkpointing the edge list pre-hashed by
    # ``v`` (repartition before the checkpoint; LogicalRDD preserves
    # outputPartitioning) removes one edge-side Exchange per FULL round
    # at the cost of one up-front repartition — net saving (rounds−2).
    # Measured on the gate graph (same-session interleaved A/B, sf0.1):
    # the loop converges after ONE full round, so the trade is net
    # negative (median 1.49 → 1.61 s). Worth revisiting only for graphs
    # whose diameter forces ≥ 3 full rounds.
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    # r17 round-1 specialization (guide §2.4): with identity labels the
    # first round's neighbour-min join degenerates to min(v) per u and
    # the pointer jump to a no-op, so round 1 is ONE map-side-combined
    # aggregation over the checkpointed edge list — replacing the old
    # distinct-vertices checkpoint (action), its emptiness take(1), and
    # the three-join round (labels after round 1 are bit-identical:
    # least(id, min neighbour id) is what the general round computes
    # from identity labels, and the empty-edge case now falls through
    # the ordinary convergence check).
    flagged = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("nbr"))
        .select(
            F.col("u").alias("id"),
            F.least(F.col("u"), F.col("nbr")).alias("label"),
            (F.col("nbr") < F.col("u")).alias("chg"),
        )
        .localCheckpoint()
    )
    labels = flagged.select("id", "label")
    if not flagged.filter("chg").take(1):
        return labels.select("id", F.col("label").alias("component"))

    for _ in range(max_iter - 1):
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


# ---------------------------------------------------------------------------
# PageRank (exact fixed-point variant)
# ---------------------------------------------------------------------------

PR_UNIT = 1_000_000  # rank fixed point: 1.0 == 1e6 micro-units
PR_BASE = 150_000    # (1 - d) in micro-units, d = 0.85
PR_DAMP_NUM, PR_DAMP_DEN = 850, 1_000


def pagerank(edges: DataFrame, iters: int = 3, checkpoint_every: int = 4) -> DataFrame:
    """(node, rank) — PageRank over the undirected graph given by
    ``edges`` (columns ``src``, ``dst``; callers pass each undirected
    edge ONCE in each direction), in EXACT integer arithmetic so the
    result is bit-identical across engines and the driver gate can hash
    it (the LM scorer's micro-unit discipline, applied to an iterative
    graph algorithm):

    ``r0(v) = 1e6``;
    ``r+1(v) = 150_000 + (850 · Σ_{(u,v)∈E} (r(u) // deg(u))) // 1000``

    — i.e. damping 0.85 with per-edge contributions floor-divided in
    micro-units. The //-truncation drops < 1 micro-unit per edge per
    round relative to float PageRank: ranking-irrelevant, and what
    buys exactness (float contributions would sum in engine-dependent
    order). Fixed ``iters`` (no convergence test) keeps the plan a
    pure function of the inputs.

    Scale: one shuffle keyed on src (the rank join), one on dst (the
    contribution sum) per round — the standard distributed PageRank;
    the degree table joins broadcast-or-shuffle as Catalyst sizes it.
    Lineage is ``localCheckpoint``-truncated every ``checkpoint_every``
    rounds like :func:`connected_components`."""
    nodes = edges.select(F.col("src").alias("node")).distinct()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.lit(PR_UNIT).cast("long").alias("rank"))
    for i in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                # JVM long division: exact trunc-toward-zero, DuckDB //
                F.call_function("div", F.col("rank"), F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        from timeseries_db_spark.functions.numeric import duck_div

        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(PR_BASE)
                + duck_div(
                    F.lit(PR_DAMP_NUM) * F.coalesce(F.col("s"), F.lit(0)),
                    PR_DAMP_DEN,
                )
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def supplier_influence_pagerank(spark, sf_dir: str, iters: int = 3) -> DataFrame:
    """PageRank over the customer↔supplier trade graph: one undirected
    edge per DISTINCT (o_custkey, l_suppkey) pair that ever traded
    (orders ⋈ lineitem). Node ids disambiguate the bipartite sides as
    ``2·custkey`` / ``2·suppkey + 1``. The "which suppliers sit at the
    center of the purchase network" question — the relational engine's
    entry into iterative graph analytics."""
    from timeseries_db_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return pagerank(edges, iters=iters)


def supplier_influence_pagerank_sql(iters: int = 3) -> str:
    """DuckDB twin: the same integer updates, unrolled one CTE per
    iteration (fixed ``iters`` makes recursion unnecessary)."""
    ctes = [
        """pairs AS (
            SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        )""",
        """bi AS (
            SELECT c AS src, s AS dst FROM pairs
            UNION ALL
            SELECT s AS src, c AS dst FROM pairs
        )""",
        "nodes AS (SELECT DISTINCT src AS node FROM bi)",
        "deg AS (SELECT src, count(*) AS deg FROM bi GROUP BY src)",
        f"r0 AS (SELECT node, CAST({PR_UNIT} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"""r{i + 1} AS (
            SELECT n.node,
                   CAST({PR_BASE} + ({PR_DAMP_NUM} * COALESCE(t.s, 0))
                        // {PR_DAMP_DEN} AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT bi.dst AS node, SUM(r{i}.rank // deg.deg) AS s
                FROM bi
                JOIN r{i} ON r{i}.node = bi.src
                JOIN deg ON deg.src = bi.src
                GROUP BY bi.dst
            ) t ON t.node = n.node
        )"""
        )
    return f"WITH {', '.join(ctes)} SELECT node, rank FROM r{iters}"
