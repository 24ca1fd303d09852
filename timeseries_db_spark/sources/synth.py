"""Deterministic synthetic fixtures for the SCALING-SLOPE bench
(VERDICT r8 item 7): the driver testdata tops out at sf0.1, so the
100 TB claims rested on plan shape alone. These generators emit the
same table shapes at ANY row count with SCALE-INVARIANT characteristics
— constant near-duplicate fraction, constant events-per-user, constant
tag fan — so sec-per-row between two scales measures the ENGINE's
scaling, not a drifting data distribution. A superlinear operator (for
example a pair explode whose candidate count grows faster than the
corpus) shows up here first.

Everything is a pure function of the row index via ``spark.range`` —
splittable, distributed, no Python in the data path, and byte-stable
across runs (no RNG, no clock).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Generator version — part of the on-disk cache key; bump on ANY
#: change to the formulas below so stale /tmp fixtures regenerate.
SYNTH_VERSION = 3  # r11: embeddings joined the fixture (hash-center form)

#: Matches the driver events fixture: 4 funnel steps (sessionize_30m's
#: funnel leg needs signup→view→click→purchase) + an error tag.
EVENT_TYPES = ("signup", "view", "click", "purchase", "error")

EVENTS_T0_MS = 1_704_067_200_000  # 2024-01-01 UTC, like the driver data
EVENTS_SPAN_MS = 30 * 86_400_000  # fixed 30-day window at every scale
EVENTS_PER_USER = 64  # constant → user count scales with rows

#: documents: ~1 in DUP_EVERY is a near-copy of its predecessor with two
#: words perturbed — constant near-dup fraction at every scale.
DUP_EVERY = 40
VOCAB = 2003  # prime → the (31i + 17j²) walk cycles through all tokens


def synth_events(spark, n_rows: int) -> DataFrame:
    """(event_id, ts, user_id, event_type, value, props) — density grows
    with ``n_rows`` over the FIXED 30-day window (what growing data at a
    constant retention window means); per-user volume stays constant so
    user-keyed operators (sessionize, funnel) see the same per-key work
    per row at every scale."""
    i = F.col("id")
    h = (i * 2_654_435_761) % 2_147_483_647  # Knuth multiplicative hash
    ts_ms = F.lit(EVENTS_T0_MS) + (h * 7 + i) % EVENTS_SPAN_MS
    etype = F.array(*[F.lit(t) for t in EVENT_TYPES])[
        (h % len(EVENT_TYPES)).cast("int")
    ]
    # r10 ADVICE: for n_rows < EVENTS_PER_USER the divisor would be 0
    # and Spark's non-ANSI % yields NULL user_ids SILENTLY, breaking
    # the constant-events-per-user invariant with no signal — clamp to
    # one user instead (the invariant is vacuous below one user's rows)
    n_users = max(1, n_rows // EVENTS_PER_USER)
    return spark.range(n_rows).select(
        i.alias("event_id"),
        F.timestamp_millis(ts_ms).alias("ts"),
        (i % n_users).alias("user_id"),
        etype.alias("event_type"),
        ((h % 10_000) / F.lit(100.0)).alias("value"),
        F.concat(
            F.lit('{"k": '),
            (h % 100).cast("string"),
            F.lit(', "site": "s'),
            (h % 7).cast("string"),
            F.lit('"}'),
        ).alias("props"),
    )


def _doc_words(src_col, n_words_col):
    """Word ``j`` of doc ``src`` = t<(31·src + 17j²) mod VOCAB> — a pure
    index formula, so a near-dup row can re-derive its PREDECESSOR's
    words without a join."""
    return F.transform(
        F.sequence(F.lit(1), n_words_col),
        lambda j: F.concat(
            F.lit("t"), ((src_col * 31 + j * j * 17) % VOCAB).cast("string")
        ),
    )


def synth_documents(spark, n_docs: int) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) — 50-150 synthetic-token
    words per doc; every ``DUP_EVERY``-th doc re-derives its
    predecessor's words and perturbs two of them (Jaccard ≈ 0.97: above
    every dedup threshold in the registry), so near-dup density — and
    with it LSH candidate structure — is constant across scales."""
    i = F.col("id")
    is_dup = (i % DUP_EVERY == 0) & (i > 0)
    src = F.when(is_dup, i - 1).otherwise(i)
    n_words = (F.lit(50) + (src * 13) % 101).cast("int")
    words = _doc_words(src, n_words)
    # perturb positions 2 and 3 of a near-dup with doc-unique tokens
    words = F.when(
        is_dup,
        F.concat(
            F.slice(words, 1, 1),
            F.array(
                F.concat(F.lit("x"), i.cast("string")),
                F.concat(F.lit("y"), i.cast("string")),
            ),
            F.slice(words, 4, 10_000),
        ),
    ).otherwise(words)
    text = F.array_join(words, " ")
    return spark.range(n_docs).select(
        i.alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


#: embeddings: latent cluster count (prime, ≈ the gate IVF nlist order
#: of magnitude) — constant at every scale, so IVF list population per
#: cluster grows linearly with the corpus and the nprobe/nlist prune
#: ratio is scale-invariant.
EMB_CLUSTERS = 97
EMB_DIM = 64  # matches the driver embeddings fixture


def synth_embeddings(spark, n_vecs: int, dim: int = EMB_DIM) -> DataFrame:
    """(vec_id, embedding array<float>, label) — each vector is a
    deterministic latent-cluster center (``vec_id % EMB_CLUSTERS``)
    plus bounded per-component jitter (±0.4 via ``xxhash64``), all
    JVM-side. Clustered rather than uniform so an IVF coarse quantizer
    finds real structure: probing ``nprobe`` of ``nlist`` lists prunes
    the same ~nprobe/nlist candidate fraction at every scale, which is
    exactly the claim the ANN slope entries measure."""
    i = F.col("id")
    c = i % EMB_CLUSTERS
    # center: hash-uniform per (cluster, dim) in ~(-2, 2); jitter:
    # hash-uniform per (vector, dim) in ±0.2 — well-separated clusters
    # (same-cluster distance ≈ 5× smaller than cross-cluster), asserted
    # in test_synth.py. Distinct literal seeds keep the two hashes
    # uncorrelated when vec_id happens to equal its cluster id.
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.xxhash64(F.lit("c"), c, j) % 1000) / F.lit(500.0)
            + (F.xxhash64(F.lit("v"), i, j) % 201) / F.lit(1000.0)
        ).cast("float"),
    )
    return spark.range(n_vecs).select(
        i.alias("vec_id"),
        emb.alias("embedding"),
        (i % 11).cast("int").alias("label"),
    )


def materialize_fixture(
    spark, base_dir: str, n_events: int, n_docs: int, n_vecs: int | None = None
) -> str:
    """Write (or reuse) the synthetic fixture as an sf-dir-shaped
    directory — ``events.parquet`` + ``documents.parquet`` +
    ``embeddings.parquet`` (r11; ``n_vecs`` defaults to ``n_docs``) —
    so gate callables run on it unchanged. Idempotent: a ``_done``
    marker keyed by (version, sizes) skips regeneration; a partial dir
    (no marker) is rebuilt."""
    if n_vecs is None:
        n_vecs = n_docs
    tag = f"v{SYNTH_VERSION}_e{n_events}_d{n_docs}_v{n_vecs}"
    out = os.path.join(base_dir, tag)
    done = os.path.join(out, "_done")
    if os.path.exists(done):
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    synth_events(spark, n_events).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    synth_documents(spark, n_docs).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    synth_embeddings(spark, n_vecs).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    with open(done, "w") as f:
        f.write(tag)
    return out
