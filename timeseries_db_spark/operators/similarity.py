"""Similarity search over an embedding column (``array<float>``).

Two paths, as a 100 TB design requires:

* **Brute-force top-k / threshold pairs** — the exact baseline. Scoring
  runs as an Arrow-batched ``mapInPandas`` matmul against a broadcast,
  L2-normalized corpus matrix: one BLAS call per Arrow batch instead of
  a per-pair ``zip_with`` fold (~orders of magnitude faster), and the
  corpus rides the executor broadcast, so the query side scales out
  linearly with partitions. This is exact and oracle-checked against
  DuckDB's ``list_cosine_similarity``.
* **SRP-LSH bucketed ANN** — the scale path when the corpus itself is
  huge: signed-random-projection signatures put vectors into 2^bits
  buckets per hash table; candidates = bucket collisions in any table;
  exact cosine re-ranks candidates only. Deterministic planes (seeded)
  so results are reproducible; registered as a rows-only check (the
  candidate set is recall<1 by construction on near-random data) with a
  pytest asserting candidates ⊆ brute-force and reporting recall.

Ranking determinism across engines: ties are broken on the cosine
ROUNDED to 6 decimals — with DuckDB's exact rounding semantics on both
sides (``functions.numeric.duck_round`` / ``_np_duck_round``; numpy's
half-to-even and Spark's shortest-string rounding both disagree with
DuckDB at exact ties) — then neighbor id, so both engines cut the same
top-k even when raw floats differ in the last ulp.

At 100 TB: the corpus matrix no longer fits one broadcast — the same
operator shape shards the corpus (mapInPandas over corpus partitions,
re-rank top-k per shard, final top-k merge = a groupBy window), or the
LSH path bounds candidates per query. The operator interfaces here are
written so either backend slots in.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round
from timeseries_db_spark.functions.numeric import np_duck_round as _np_duck_round

#: Exact cosine, JVM-side: zip_with dot product + aggregate fold — no
#: Python in the re-ranking hot path (the brief's F.aggregate/F.zip_with
#: pattern). Elements cast to double once.
_DOT = (
    "aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (a, v) -> a + v)"
)


def _norm_expr(col: str) -> str:
    return (
        f"sqrt(aggregate(transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (a, v) -> a + v))"
    )



#: SRP-LSH defaults: 4 independent tables of 6 hyperplanes (64 buckets).
SRP_TABLES = 4
SRP_BITS = 6
SRP_SEED = 7


def _corpus_matrix(emb: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect (ids, L2-normalized fp64 matrix) for broadcasting."""
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    if not len(pdf):  # np.stack needs >=1 array; callers check shape[0]
        return ids, np.zeros((0, 0))
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, m / norms


def _scores_map_fn(bc, exclude_self: bool, min_cos: float | None):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            scores = (q / qn) @ mat.T  # (batch, corpus) — one BLAS call
            qids = pdf["vec_id"].to_numpy()
            for row_i in range(len(pdf)):
                cos = scores[row_i]
                mask = np.ones(len(ids), dtype=bool)
                if exclude_self:
                    mask &= ids != qids[row_i]
                if min_cos is not None:
                    # slack must cover ROUNDING to 4 decimals downstream,
                    # not just float noise: a raw cos of threshold-4.9e-5
                    # still rounds up to the threshold
                    mask &= cos >= (min_cos - 5.001e-5)
                sel = np.flatnonzero(mask)
                if not len(sel):
                    continue
                yield pd.DataFrame(
                    {
                        "qid": np.full(len(sel), qids[row_i], dtype=np.int64),
                        "nid": ids[sel].astype(np.int64),
                        "cos_raw": cos[sel],
                    }
                )

    return gen


def cosine_scores(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    *,
    exclude_self: bool = True,
    min_cos: float | None = None,
) -> DataFrame:
    """(qid, nid, cos_raw) for every query×corpus pair passing ``min_cos``."""
    bc = spark.sparkContext.broadcast(_corpus_matrix(corpus))
    return queries.select("vec_id", "embedding").mapInPandas(
        _scores_map_fn(bc, exclude_self, min_cos),
        schema="qid long, nid long, cos_raw double",
    )


def _topk_map_fn(bc, k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            scores = (q / qn) @ mat.T
            qids = pdf["vec_id"].to_numpy()
            for row_i in range(len(pdf)):
                c6 = _np_duck_round(scores[row_i], 6)
                mask = ids != qids[row_i]
                sel = np.flatnonzero(mask)
                # deterministic ranking (c6 DESC, nid ASC): lexsort keys
                # are applied last-key-primary
                order = np.lexsort((ids[sel], -c6[sel]))[:k]
                pick = sel[order]
                yield pd.DataFrame(
                    {
                        "qid": np.full(len(pick), qids[row_i], dtype=np.int64),
                        "nid": ids[pick].astype(np.int64),
                        "cos": _np_duck_round(c6[pick], 4),
                    }
                )

    return gen


def cosine_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
) -> DataFrame:
    """Exact top-k neighbors per query: (qid, nid, cos). Deterministic
    ranking on (round(cos,6) DESC, nid ASC).

    The corpus is broadcast, so each task holds every candidate for its
    queries and the top-k is selected INSIDE the Arrow batch — only k
    rows per query ever leave Python, and the plan has no shuffle at all
    (the earlier form emitted |corpus| rows per query into a
    row_number window: a |Q|×|C| Arrow transfer plus an exchange)."""
    bc = spark.sparkContext.broadcast(_corpus_matrix(corpus))
    return queries.select("vec_id", "embedding").mapInPandas(
        _topk_map_fn(bc, k), schema="qid long, nid long, cos double"
    )


def cosine_topk_sql(query_pred: str, k: int) -> str:
    """DuckDB twin of :func:`cosine_topk` for queries selected from the
    embeddings table by ``query_pred``."""
    return f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE {query_pred}
        ),
        p AS (
            SELECT qid, e.vec_id AS nid,
                   round(list_cosine_similarity(qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS c6
            FROM q JOIN embeddings e ON e.vec_id <> qid
        ),
        r AS (
            SELECT qid, nid, c6,
                   row_number() OVER (PARTITION BY qid ORDER BY c6 DESC, nid ASC) AS rn
            FROM p
        )
        SELECT qid, nid, round(c6, 4) AS cos FROM r WHERE rn <= {k}
    """


def near_dup_pairs(
    spark: SparkSession, emb: DataFrame, threshold: float
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos ≥ threshold)."""
    scored = cosine_scores(spark, emb, emb, min_cos=threshold)
    return (
        scored.filter(F.col("qid") < F.col("nid"))
        .withColumn("cos", duck_round(F.col("cos_raw"), 4))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("qid").alias("id_a"), F.col("nid").alias("id_b"), "cos"
        )
    )


def near_dup_pairs_sql(threshold: float) -> str:
    return f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= {threshold}
    """


# ---------------------------------------------------------------------------
# SRP-LSH (the huge-corpus path)
# ---------------------------------------------------------------------------


def _srp_planes(dim: int) -> np.ndarray:
    """(tables, bits, dim) deterministic hyperplanes."""
    rng = np.random.default_rng(SRP_SEED)
    return rng.standard_normal((SRP_TABLES, SRP_BITS, dim))


def srp_signatures(spark: SparkSession, emb: DataFrame, dim: int) -> DataFrame:
    """(vec_id, table, bucket) — one row per hash table per vector."""
    planes = _srp_planes(dim)
    bc = spark.sparkContext.broadcast(planes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        weights = (1 << np.arange(SRP_BITS)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = []
            for t in range(SRP_TABLES):
                bits = (v @ pl[t].T) > 0  # (n, bits)
                bucket = bits.astype(np.int64) @ weights
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "table": np.full(len(pdf), t, dtype=np.int32),
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(out)

    return emb.select("vec_id", "embedding").mapInPandas(
        gen, schema="vec_id long, table int, bucket long"
    )


def ann_topk_srp(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
) -> DataFrame:
    """Approximate top-k: SRP bucket collisions (any table) generate
    candidates; exact cosine re-ranks candidates only. Same output shape
    and ranking rule as :func:`cosine_topk`, recall < 1."""
    sig_q = srp_signatures(spark, queries, dim).withColumnRenamed("vec_id", "qid")
    sig_c = srp_signatures(spark, corpus, dim).withColumnRenamed("vec_id", "nid")
    cand = (
        sig_q.join(sig_c, on=["table", "bucket"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = corpus.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ce"))
    scored = (
        cand.join(q, "qid")
        .join(c, "nid")
        .withColumn(
            "c6",
            duck_round(
                F.expr(_DOT) / (F.expr(_norm_expr("qe")) * F.expr(_norm_expr("ce"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("c6").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", duck_round(F.col("c6"), 4).alias("cos"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the scale path beside SRP-LSH
# ---------------------------------------------------------------------------

#: Every ``IVF_STRIDE``-th vector is a centroid (deterministic coarse
#: quantizer — a seeded k-means would drop in here; the IVF mechanics are
#: identical and the pipeline stays reproducible without an iterative fit).
IVF_STRIDE = 40
IVF_NPROBE = 4

def _ivf_assign_fn(bc, nprobe: int):
    """Emit (vec_id, list_id) for each vector's ``nprobe`` nearest
    centroids (nprobe=1 assigns the corpus; nprobe>1 probes queries)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _, cmat = bc.value
        # a small corpus can yield fewer centroids than nprobe
        k = min(nprobe, cmat.shape[0])
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            sim = (v / n) @ cmat.T  # (rows, n_centroids)
            top = np.argsort(-sim, axis=1)[:, :k]
            rows = np.repeat(pdf["vec_id"].to_numpy(), k)
            yield pd.DataFrame(
                {"vec_id": rows, "list_id": top.ravel().astype(np.int64)}
            )

    return gen


def ann_topk_ivf(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    stride: int = IVF_STRIDE,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed under their
    nearest centroid (inverted lists); each query probes its ``nprobe``
    nearest lists and exact-reranks only those candidates. Output shape
    and ranking rule match :func:`cosine_topk`; recall < 1 by design.

    Scale: only centroids broadcast (|corpus|/stride rows); the corpus is
    never collected. Candidate generation is an equi-join on ``list_id``
    (shuffle keyed by list — bucket-local fan-out like the LSH band join),
    and re-ranking is JVM expressions, so the whole path stays distributed
    with one small Python stage for the argmax assignments."""
    cents = _corpus_matrix(corpus.filter(F.col("vec_id") % stride == 0))
    if cents[1].shape[0] == 0:
        raise ValueError(
            f"IVF stride {stride} selects no centroids from this corpus — "
            "lower the stride"
        )
    cents_bc = spark.sparkContext.broadcast(cents)
    assign = corpus.select("vec_id", "embedding").mapInPandas(
        _ivf_assign_fn(cents_bc, 1), schema="vec_id long, list_id long"
    )
    probes = queries.select("vec_id", "embedding").mapInPandas(
        _ivf_assign_fn(cents_bc, nprobe), schema="vec_id long, list_id long"
    )
    cand = (
        probes.withColumnRenamed("vec_id", "qid")
        .join(assign.withColumnRenamed("vec_id", "nid"), on="list_id")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    qe = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    ce = corpus.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ce"))
    scored = (
        cand.join(F.broadcast(qe), on="qid")
        .join(ce, on="nid")
        .withColumn(
            "c6",
            duck_round(
                F.expr(_DOT) / (F.expr(_norm_expr("qe")) * F.expr(_norm_expr("ce"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("c6").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", duck_round(F.col("c6"), 4).alias("cos"))
    )
