"""Streaming corpus ingest with near-duplicate suppression — the
continuous-ingest analog of the batch MinHash-LSH dedup
(``operators/dedup.py``): documents arrive as files, and each
micro-batch publishes only the docs that are NOT near-duplicates of
anything seen before them.

Semantics (chosen to be exactly oracle-reproducible): a document ``d``
is DROPPED iff some document ``e`` with ``doc_id < d.doc_id`` that has
already been SEEN (prior batch, or same batch — kept or dropped alike)
collides with ``d`` in >= 1 MinHash band AND their signatures agree on
>= ``t_est`` of the 32 permutations (the signature-estimated Jaccard —
the standard decision at scale, where re-reading both texts for an
exact verify would defeat the point of the signature index). Three
properties fall out:

* **"dominated by any earlier SEEN doc"** — not "by any earlier KEPT
  doc". The signature table records every doc ever seen (with a
  ``kept`` flag), so a doc that was itself dropped still suppresses its
  later near-copies. This is the monotone, non-recursive variant: the
  greedy keep-only-vs-survivors rule is inherently sequential (each
  decision depends on the previous one), while this rule is a pure
  function of the pairwise signature relation — embarrassingly
  parallel within a batch and expressible as one SQL query.
* **batch-boundary invariance** — because the rule depends only on
  (doc_id order, signature pairs), the FINAL published set is identical
  however the arrival stream is chopped into micro-batches, as long as
  arrival order is consistent with doc_id order. The gate oracle states
  the result closed-form over the whole corpus with no notion of
  batches at all.
* **exact duplicates need no special case** — identical text gives an
  identical shingle set, hence an identical signature: est = 1 and
  every band collides.

Exactly-once: per-batch output goes to ``batch=<id>`` partition
directories written with dynamic overwrite, so a replayed batch
rewrites its own partition idempotently; the seen-signature read
filters ``batch < current`` so a crashed attempt's own partial output
never dominates its replay.

Scale shape (100 TB): per batch, one shingle+min-monoid aggregation
over the BATCH (not the corpus), one band-key equi-join of the batch's
bands against the seen bands (linear in band-bucket collisions, never
all-pairs), one signature-compare projection on the candidate pairs,
one anti-join. The seen table is stored BAND-EXPLODED and partitioned
by ``bucket = pmod(hash(band, bkey), N_SEEN_BUCKETS)`` under each
``batch=<id>`` dir (r9 — this was previously only a docstring promise):
each batch collects its own ≤ ``N_SEEN_BUCKETS`` bucket ids (a bounded
driver list, never data rows) and the seen read prunes to exactly those
partitions, so a small batch against a years-deep index reads only the
band buckets it can possibly collide with. Signatures ride INLINE on
the band rows — 8× the storage of one row per doc, in exchange for the
verify step being a projection on the band join instead of a second
join that would shuffle the full signature history every batch. State
lives in parquet, not executor memory — no unbounded streaming state."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.hashing import MINHASH_BANDS, MINHASH_PERMS
from timeseries_db_spark.operators.dedup import (
    SHINGLE_MOD,
    _band_key_spark,
    minhash_signatures,
)

#: Minimum fraction of agreeing permutations for a candidate pair to be
#: ruled a near-duplicate. 16/32 agreeing permutations estimates
#: J ≈ 0.5 — between the batch path's verify threshold (0.7) and the
#: band-collision floor.
T_EST_DEFAULT = 0.5

_SIG_COLS = [f"m{i}" for i in range(MINHASH_PERMS)]

#: 53-bit content fingerprint of the published text — double-exact, so
#: the gate can carry it through a DOUBLE value column.
FP53_SPARK = (
    "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"
    f" % {SHINGLE_MOD}"
)
FP53_DUCK = f"('0x' || substr(md5(text), 1, 15))::BIGINT % {SHINGLE_MOD}"


def read_docs_stream(spark, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of (doc_id, text) parquet."""
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


#: Band-bucket fan of the seen-signature layout: each batch's sig rows
#: land in ``bucket = pmod(hash(band, bkey), N_SEEN_BUCKETS)`` partition
#: dirs, and the per-batch seen read prunes to the batch's own buckets.
#: 16 keeps gate-scale file counts sane; a real deployment sizes this to
#: (seen rows / target partition bytes) — the read path is unchanged.
N_SEEN_BUCKETS = 16

_BAND_COLS = ["doc_id", "band", "bkey", *_SIG_COLS]


def _banded_sigs(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bkey, m0..m31, bucket) — the band-exploded
    signature rows of one batch, in ONE map-only projection (no join
    back to the sig table: the signatures ride inline, which is what
    lets the verify step run as a projection on the band join)."""
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(band).alias("band"),
                    F.expr(_band_key_spark(band)).alias("bkey"),
                )
                for band in range(MINHASH_BANDS)
            ]
        )
    ).alias("bb")
    return sigs.select("doc_id", *_SIG_COLS, bands).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bkey").alias("bkey"),
        *_SIG_COLS,
        F.expr(f"pmod(hash(bb.band, bb.bkey), {N_SEEN_BUCKETS})").alias("bucket"),
    )


def _read_seen_sigs(
    spark, sig_dir: str, before_batch: int, buckets: list[int] | None = None
) -> DataFrame | None:
    """Band rows published by batches before ``before_batch`` — None
    when no batch has landed yet (first batch, or replay of it). With
    ``buckets``, the scan partition-prunes to those band buckets (the
    probe batch's own bucket set): ``batch`` and ``bucket`` are both
    partition columns, so the filters drop whole directories before any
    file is opened."""
    from pyspark.errors import AnalysisException

    try:
        seen = spark.read.parquet(sig_dir)
    except AnalysisException:
        return None
    if "batch" not in seen.columns:  # dir exists but holds no partitions
        return None
    seen = seen.filter(F.col("batch") < before_batch)
    if buckets is not None:
        seen = seen.filter(F.col("bucket").isin(buckets))
    return seen.select(*_BAND_COLS)


def process_corpus_batch(
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    t_est: float = T_EST_DEFAULT,
    _crash_before_docs: bool = False,
) -> None:
    """One micro-batch of the ingest — module-level so tests can drive
    and crash-inject it directly. ``_crash_before_docs`` simulates a
    failure between the two partition writes: the replay must heal it
    (both writes are per-batch overwrites, and the seen read's
    ``batch < current`` filter keeps the half-written attempt from
    dominating its own retry)."""
    spark = batch.sparkSession
    sig_dir = os.path.join(out_dir, "sigs")
    docs_dir = os.path.join(out_dir, "docs")
    batch = batch.select("doc_id", "text")
    if batch.limit(1).count() == 0:
        return
    # one shingle + 32-min-monoid aggregation pass over the batch;
    # docs with no shingle (NULL text) get no signature row and can
    # neither dominate nor be dominated — they publish unconditionally
    sigs = minhash_signatures(batch).persist()
    banded = _banded_sigs(sigs).persist()
    try:
        # the batch's own bucket set: a bounded <= N_SEEN_BUCKETS driver
        # list (never data rows) that partition-prunes the seen read
        buckets = sorted(
            r["bucket"] for r in banded.select("bucket").distinct().collect()
        )
        seen = _read_seen_sigs(spark, sig_dir, batch_id, buckets)
        earlier = (
            banded.select(*_BAND_COLS)
            if seen is None
            else seen.unionByName(banded.select(*_BAND_COLS))
        )
        # earlier docs (prior batches AND same batch — kept or dropped
        # alike) carry their signatures inline, so the band equi-join
        # already has the a-side sigs: no second join over history
        be = earlier.select(
            F.col("doc_id").alias("id_e"),
            "band",
            "bkey",
            *[F.col(m).alias(f"a_{m}") for m in _SIG_COLS],
        )
        probe = banded.select(F.col("doc_id").alias("id_d"), "band", "bkey")
        cand = (
            be.join(probe, on=["band", "bkey"])
            .filter(F.col("id_e") < F.col("id_d"))
            .dropDuplicates(["id_e", "id_d"])  # sig cols equal per id_e
        )
        sb = sigs.select(
            F.col("doc_id").alias("id_d"),
            *[F.col(m).alias(f"b_{m}") for m in _SIG_COLS],
        )
        n_match = sum(
            F.when(F.col(f"a_{m}") == F.col(f"b_{m}"), 1).otherwise(0)
            for m in _SIG_COLS
        )
        dominated = (
            cand.join(sb, "id_d")
            .filter(n_match / F.lit(float(MINHASH_PERMS)) >= F.lit(t_est))
            .select(F.col("id_d").alias("doc_id"))
            .distinct()
        )
        kept = batch.join(dominated, "doc_id", "left_anti")
        out_sigs = banded.join(
            dominated.withColumn("dom", F.lit(True)), "doc_id", "left"
        ).select(
            "doc_id",
            "band",
            "bkey",
            *_SIG_COLS,
            F.coalesce(~F.col("dom"), F.lit(True)).alias("kept"),
            "bucket",
        )
        # idempotent per-batch partition overwrite (replay-safe), band-
        # bucketed so future batches prune to their own buckets
        out_sigs.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(sig_dir, f"batch={batch_id}")
        )
        if _crash_before_docs:
            raise RuntimeError("simulated crash between sig and doc writes")
        kept.withColumn("fp53", F.expr(FP53_SPARK)).write.mode(
            "overwrite"
        ).parquet(os.path.join(docs_dir, f"batch={batch_id}"))
    finally:
        banded.unpersist()
        sigs.unpersist()


def start_corpus_ingest(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    t_est: float = T_EST_DEFAULT,
):
    """Start the ingest query. Output layout under ``out_dir``:

    * ``sigs/batch=<id>/bucket=<k>/`` — one row per (doc, band) SEEN in
      the batch (band key + inline signature + ``kept`` flag), band-
      bucketed so later batches partition-prune the seen read to their
      own buckets: the incremental LSH index.
    * ``docs/batch=<id>/`` — the published (kept) docs with their
      53-bit content fingerprint.
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        process_corpus_batch(batch, batch_id, out_dir, t_est)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_published(spark, out_dir: str) -> DataFrame:
    """The published corpus: (batch, doc_id, text, fp53)."""
    return spark.read.parquet(os.path.join(out_dir, "docs"))


def corpus_ingest_kept_sql(
    t_est: float = T_EST_DEFAULT, docs_sql: str | None = None
) -> str:
    """DuckDB closed form of the FINAL published set over the whole
    ``documents`` view — no notion of batches (see module docstring:
    the dominated-by-earlier rule is batch-boundary invariant):
    (doc_id, fp53) for every doc with no earlier band-colliding,
    signature-agreeing neighbor. ``docs_sql`` (r12) swaps the document
    source — a subquery yielding (doc_id, text), e.g. the closed form
    of a WARC-extracted corpus for the streaming WARC-ingest oracle."""
    from timeseries_db_spark.functions.hashing import MINHASH_BANDS, minhash_value_sql
    from timeseries_db_spark.operators.dedup import (
        _band_key_duck,
        _HASH_DUCK,
        _SHINGLES_CTE_DUCK,
    )

    mins = ",\n               ".join(
        f"min({minhash_value_sql('h', i)}) AS m{i}" for i in range(MINHASH_PERMS)
    )
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {band} AS band, {_band_key_duck(band)} AS bkey FROM sig"
        for band in range(MINHASH_BANDS)
    )
    n_match = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END"
        for i in range(MINHASH_PERMS)
    )
    src_cte = ""
    shingles_cte = _SHINGLES_CTE_DUCK
    final_src = "documents"
    if docs_sql is not None:
        src_cte = f"docs_src AS ({docs_sql}),"
        shingles_cte = _SHINGLES_CTE_DUCK.replace("FROM documents", "FROM docs_src")
        final_src = "docs_src"
    return f"""
        WITH {src_cte} {shingles_cte},
        hashed AS (SELECT doc_id, {_HASH_DUCK} AS h FROM sh),
        sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
        bands AS ({band_rows}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_e, b.doc_id AS id_d
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bkey = b.bkey
             AND a.doc_id < b.doc_id
        ),
        dominated AS (
            SELECT DISTINCT id_d
            FROM cand
            JOIN sig sa ON sa.doc_id = cand.id_e
            JOIN sig sb ON sb.doc_id = cand.id_d
            WHERE ({n_match}) / {float(MINHASH_PERMS)} >= {t_est}
        )
        SELECT doc_id, {FP53_DUCK} AS fp53
        FROM {final_src}
        WHERE doc_id NOT IN (SELECT id_d FROM dominated)
    """


#: Staging dir for an in-flight compaction merge. The leading dot keeps
#: Spark's file listing from ever seeing a half-written merge.
_COMPACT_TMP = ".compact_tmp"


def _compact_batches(spark, data_dir: str, partition_by: list[str] | None = None) -> int:
    """Merge every ``batch=N`` partition under ``data_dir`` except the
    most recent into ONE fresh partition, never touching a source dir
    until the merge is fully on disk:

    1. write the merged rows (``dropDuplicates``-ed, so a rerun after a
       crash clears any duplicate copies a previous attempt left) to a
       hidden ``.compact_tmp`` staging dir — a crash here leaves every
       source intact and the stage invisible to readers;
    2. ``os.rename`` the stage to ``batch=<fresh>`` — atomic on a posix
       filesystem, and ``fresh`` is a NEGATIVE id (below every streaming
       batch id, so it always passes the ``batch < current`` seen-read
       filter and never collides with a replay);
    3. only then delete the absorbed source partitions — a crash between
       2 and 3 leaves duplicate rows (never lost rows), and rerunning
       the compaction absorbs-and-dedupes them.

    Returns the NET number of partitions eliminated."""
    import shutil

    try:
        df = spark.read.parquet(data_dir)
    except Exception:
        return 0
    if "batch" not in df.columns:
        return 0
    batches = sorted(r["batch"] for r in df.select("batch").distinct().collect())
    if len(batches) <= 2:
        return 0
    last = batches[-1]
    fresh = min(0, batches[0]) - 1
    tmp = os.path.join(data_dir, _COMPACT_TMP)
    shutil.rmtree(tmp, ignore_errors=True)  # stale stage from a crashed run
    writer = (
        df.filter(F.col("batch") < last)
        .drop("batch")
        .dropDuplicates()
        .write.mode("overwrite")
    )
    if partition_by:  # preserve the sub-partitioning (e.g. band buckets)
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    os.rename(tmp, os.path.join(data_dir, f"batch={fresh}"))
    for b in batches[:-1]:
        shutil.rmtree(os.path.join(data_dir, f"batch={b}"), ignore_errors=True)
    return len(batches) - 2


def compact_seen_sigs(spark, out_dir: str) -> int:
    """Offline maintenance for a STOPPED ingest: merge every signature
    partition except the most recent into one fresh partition, so a
    long-lived stream's thousands of tiny ``batch=N`` dirs become two.
    The most recent batch is left untouched because it is the only one
    a checkpoint restart can replay (a replay overwrites its own
    partition; compacting it away would race that overwrite).

    Crash-safety is the writer's job (:func:`_compact_batches`): the
    merge lands in a hidden staging dir and is atomically renamed into
    place BEFORE any source partition is deleted, so no crash point can
    lose absorbed history (ADVICE r8: the previous in-place overwrite of
    the oldest partition destroyed all absorbed signatures if the write
    crashed midway — silently un-suppressing future near-duplicates).
    The worst post-crash state is duplicate signature rows, which the
    dedup decision — a pure existence test — ignores, and which the
    rerun's ``dropDuplicates`` clears. The band-bucket sub-partitioning
    is preserved, so reads keep pruning after compaction. Returns net
    partitions removed."""
    return _compact_batches(
        spark, os.path.join(out_dir, "sigs"), partition_by=["bucket"]
    )


def compact_published(spark, out_dir: str) -> int:
    """Offline maintenance for the published DOCS partitions — same
    contract and the same staged-write + atomic-rename ordering as
    :func:`compact_seen_sigs`. Published docs are a plain union for
    readers (``read_published``), and batch ids are not part of the
    dedup decision on this side at all, so the merged layout is
    observationally identical. A crash between the rename and the source
    deletions leaves duplicate published rows visible to readers (never
    lost rows); rerun the compaction to clear them before consuming.
    Returns net partitions removed."""
    return _compact_batches(spark, os.path.join(out_dir, "docs"))
