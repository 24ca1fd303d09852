"""Deduplication operators over the ``documents`` table — exact,
n-gram-Jaccard, MinHash+LSH, SimHash (embedding near-dup lives in
``operators/similarity.py``).

Everything runs on built-in Spark SQL expressions (JVM, codegen) and each
operator ships a DuckDB SQL twin generated from the SAME Python constants
(`functions/hashing.py`), so even MinHash/SimHash are value-hash
verifiable — not just rows-only.

Scale design (100 TB):

* **exact** — one hash-shuffle on a 60-bit fingerprint; map-side partial
  aggregation collapses duplicates before the exchange.
* **n-gram Jaccard** — the classic shingle-inverted-index join. The
  shuffle key is the shingle; ``df_limit`` drops shingles whose document
  frequency exceeds a cap (stop-shingles produce quadratic join
  fan-out — dropping them is both the standard practice and a huge skew
  guard). Pair counting is a second shuffle keyed by the (a,b) pair.
* **MinHash LSH** — replaces the all-pairs shingle join with a
  band-bucket join: candidates share one of 8 four-row band keys, so the
  join fan-out is bucket-local. Signatures are one aggregation pass
  (32 `min` monoids — Spark's partial/final agg handles them in one
  shuffle). Candidates are then verified with the exact Jaccard.
* **SimHash** — one aggregation pass builds 60-bit signatures; pairing
  joins on 15-bit bands (4 probes) and verifies with
  ``bit_count(xor) <= k`` — Hamming-ball search without an all-pairs
  product.
"""

from __future__ import annotations

import threading
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round
from timeseries_db_spark.functions.hashing import (
    MINHASH_BANDS,
    MINHASH_P,
    MINHASH_PERMS,
    MINHASH_ROWS,
    SIMHASH_BITS,
    md5_long_sql,
    minhash_value_sql,
)
from timeseries_db_spark.operators.text import NORM_DUCK, NORM_SPARK, TOKENS_DUCK, TOKENS_SPARK

# ---------------------------------------------------------------------------
# shingling (word 3-grams, distinct per document)
# ---------------------------------------------------------------------------

SHINGLE_W = 3

#: One live cached signature DataFrame per operator family. persist()
#: without a later unpersist() accumulates storage-memory blocks across
#: invocations (gate sweep + bench + API reuse in one session); the
#: returned plans are lazy so the operator itself never sees a safe
#: unpersist point. Releasing the PREVIOUS invocation's cache on entry
#: bounds the leak at one generation per family. Trade-off, explicit:
#: a plan returned by an EARLIER invocation of the same family stays
#: CORRECT after its cache is released (unpersist only drops blocks;
#: the plan recomputes), but loses the cached-self-join speedup — if
#: you interleave two long-lived plans of one family, materialize the
#: first before building the second. The lock covers concurrent driver
#: threads racing the pop/persist pair.
_live_caches: dict[str, DataFrame] = {}
#: Python-side objects (e.g. Broadcast handles inside mapInPandas
#: closures) that must outlive the cached plan: if the handle is GC'd,
#: the ContextCleaner may remove the broadcast data, and a later
#: recompute of an evicted cached block would fail loudly. Pinned per
#: cache generation, dropped with it.
_live_pins: dict[str, tuple] = {}
_cache_lock = threading.Lock()


def _persist_tracked(
    key: str,
    df: DataFrame,
    plan_key: str | None = None,
    pins: tuple = (),
) -> DataFrame:
    """Persist ``df`` under ``key``, REUSING an existing cache when the
    semantic plan is identical — e.g. `dedup_minhash_lsh` and
    `dedup_clusters` both build the minhash signatures of the same
    parquet input in one session, and repeated bench/gate sweeps
    re-invoke the same query: one materialization serves them all. A
    same-key call with a DIFFERENT plan (new input) releases the old
    generation first, so the leak stays bounded at one cache per
    (family, live input). ``semanticHash`` keys the normalized logical
    plan, which pins the input files/expressions — not execution state.

    OVERWRITE-IN-PLACE HAZARD (ADVICE r6): the semantic hash does NOT
    see file CONTENTS — rewriting the input parquet at the same path
    within a live session (e.g. testdata regeneration) leaves the plan
    identical and silently returns the stale persisted result. Any flow
    that regenerates inputs without restarting the session must call
    :func:`release_caches` first (new sessions — the driver's per-round
    pattern — are unaffected).

    ``plan_key`` (r17): plans that embed per-invocation broadcast
    variables inside pickled Python closures (mapInPandas kernels) get
    a DIFFERENT ``semanticHash`` on every build even though their
    values are fully determined by their inputs — so the cache silently
    missed forever and each invocation re-materialized + unpersisted
    the previous generation (measured: the ANN assignment and
    shortlist families never hit across bench runs). Such callers pass
    an explicit ``plan_key`` derived from the semantic hashes of the
    plan's INPUT frames plus every literal parameter; the same
    overwrite-in-place hazard above applies unchanged. ``pins`` keeps
    caller-supplied Python objects (broadcast handles referenced by the
    plan's pickled closures) alive for the cache generation's lifetime
    — see ``_live_pins``."""
    with _cache_lock:
        full = f"{key}:{plan_key if plan_key is not None else df.semanticHash()}"
        hit = _live_caches.get(full)
        if hit is not None:
            return hit
        # family key is the prefix before the FIRST colon (plan_key
        # values may themselves contain colons)
        stale = [k for k in _live_caches if k.split(":", 1)[0] == key]
        for k in stale:
            _live_caches.pop(k).unpersist()
            _live_pins.pop(k, None)
        _live_caches[full] = df.persist()
        if pins:
            _live_pins[full] = tuple(pins)
        return _live_caches[full]


def _persist_tracked_lazy(
    key: str,
    plan_key: str,
    builder,
    pins: tuple = (),
) -> DataFrame:
    """:func:`_persist_tracked` for callers whose plan CONSTRUCTION is
    itself expensive (r17, guide §1.2 per-task→driver work): gate
    entries rebuilt multi-hundred-ms window/join plans on every
    invocation only to discover the persisted generation already
    existed. ``builder`` runs ONLY on a cache miss; ``plan_key`` must
    therefore capture the full input identity the semantic hash would
    have (input-frame hashes + every literal parameter — same contract
    as :func:`_persist_tracked`'s ``plan_key``, same
    overwrite-in-place hazard)."""
    full = f"{key}:{plan_key}"
    with _cache_lock:
        hit = _live_caches.get(full)
        if hit is not None:
            return hit
    df = builder()
    with _cache_lock:
        hit = _live_caches.get(full)
        if hit is not None:
            return hit
        stale = [k for k in _live_caches if k.split(":", 1)[0] == key]
        for k in stale:
            _live_caches.pop(k).unpersist()
            _live_pins.pop(k, None)
        _live_caches[full] = df.persist()
        if pins:
            _live_pins[full] = tuple(pins)
        return _live_caches[full]


def _persist_fresh(key: str, df: DataFrame) -> DataFrame:
    """PER-INVOCATION persist (r18): a fresh cache generation on every
    call — ``plan_key`` is a random nonce, so a later invocation never
    hits this generation (it recomputes from its inputs, releasing the
    previous generation; the leak stays bounded at one per family like
    :func:`_persist_tracked`). Use for small frames referenced several
    times INSIDE one plan (Catalyst does not CSE repeated subtrees, and
    AQE exchange reuse does not fire across our union/join branches —
    measured: the LSH candidate subtree executed 4-5× per
    dedup_minhash_lsh invocation, 49 exchanges / 40 file scans in the
    executed plan). This is NOT cross-run result caching: every
    bench/oracle invocation re-materializes from parquet."""
    return _persist_tracked(key, df, plan_key=uuid.uuid4().hex)


def release_caches() -> None:
    """Explicitly drop all cached signature tables — at session end, or
    REQUIRED after overwriting an input parquet in place (see
    :func:`_persist_tracked`'s hazard note)."""
    with _cache_lock:
        for df in _live_caches.values():
            df.unpersist()
        _live_caches.clear()
        _live_pins.clear()


#: Shingle expression over a pre-bound ``toks`` column. Binding the
#: tokenization ONCE in a prior projection matters enormously: textually
#: inlining the regex split here would re-run it per reference — and the
#: references inside the ``transform`` lambda are evaluated per element,
#: i.e. one full-document regex split per shingle per subscript (measured
#: 6× slower on the sf0.1 documents table). Multi-referenced non-cheap
#: aliases are not collapsed by Catalyst, so the two-step form evaluates
#: the split exactly once per row.
#: Shingle identity is a 53-bit integer, not the concatenated string:
#: each token is hashed once (60-bit md5-long), and a 3-token shingle is
#: the polynomial fold of its token hashes mod the largest prime below
#: 2**53 (fold accumulator ≤ (MOD-1)*257 + 2**60 < 2**62 — no signed
#: overflow in either engine). Versus md5-of-concat-string per shingle
#: this skips every concat_ws allocation, dedupes/joins on longs instead
#: of strings, and measured ~2× faster over the documents corpus; the
#: ~n²/2**54 per-document collision odds are noise for Jaccard /
#: contamination purposes and the DuckDB twin folds identically, so the
#: value-level oracle stays bitwise.
SHINGLE_MOD = 9_007_199_254_740_881
SHINGLE_BASE = 257

_TOK_HASHES_SPARK = (
    "transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"
)
_TOK_HASHES_DUCK = (
    f"list_transform({TOKENS_DUCK}, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)"
)


def _shingle_fold(terms: list[str]) -> str:
    """((h0 % MOD) * B + h1) % MOD ... — shared Spark/DuckDB arithmetic."""
    h = f"{terms[0]} % {SHINGLE_MOD}"
    for t in terms[1:]:
        h = f"(({h}) * {SHINGLE_BASE} + {t}) % {SHINGLE_MOD}"
    return h


SHINGLES_SPARK = f"""
    transform(
      array({_TOK_HASHES_SPARK}),
      hs -> CASE
        WHEN size(hs) = 1 THEN array({_shingle_fold(['hs[0]'])})
        WHEN size(hs) = 2 THEN array({_shingle_fold(['hs[0]', 'hs[1]'])})
        ELSE array_distinct(transform(
               sequence(0, size(hs) - {SHINGLE_W}),
               i -> {_shingle_fold([f'hs[i+{j}]' for j in range(SHINGLE_W)])}))
      END
    )[0]
"""

SHINGLES_DUCK = f"""
    list_transform(
      [{_TOK_HASHES_DUCK}],
      hs -> CASE
        WHEN len(hs) = 1 THEN [{_shingle_fold(['hs[1]'])}]
        WHEN len(hs) = 2 THEN [{_shingle_fold(['hs[1]', 'hs[2]'])}]
        ELSE list_distinct(list_transform(
               generate_series(1, len(hs) - {SHINGLE_W - 1}),
               i -> {_shingle_fold([f'hs[i+{j}]' for j in range(SHINGLE_W)])}))
      END
    )[1]
"""


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — exploded distinct word 3-grams, identified by
    their 53-bit polynomial token-hash fold (see ``SHINGLES_SPARK``)."""
    toks = docs.select("doc_id", F.expr(TOKENS_SPARK).alias("toks"))
    return toks.select(
        "doc_id", F.explode(F.expr(SHINGLES_SPARK)).alias("shingle")
    )


_SHINGLES_CTE_DUCK = f"""
    sh AS (
        SELECT doc_id, unnest({SHINGLES_DUCK}) AS shingle FROM documents
    )
"""

def _jaccard_verify(
    sh: DataFrame,
    candidates: DataFrame,
    threshold: float,
    *,
    persist_sizes: bool = True,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate (id_a, id_b) pairs
    — used by the MinHash-LSH path (the inverted-index path derives the
    intersection directly from its self-join). duck_round, not F.round:
    the jaccard feeds the oracle value hash and Spark's string rounding
    diverges from DuckDB's at exact 4-decimal ties.

    ``sizes`` (r18): callers that already hold the per-doc
    distinct-shingle counts (the signature table's ``n_sh`` monoid)
    pass them as a (doc_id, n) frame; otherwise they are aggregated
    from ``sh`` — persisted across the na/nb joins when
    ``persist_sizes`` (Catalyst would recompute the shingle scan + agg
    twice), or recomputed per reference when the caller pre-filtered
    ``sh`` to candidate documents (tiny subtree)."""
    if sizes is None:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        if persist_sizes:
            sizes = _persist_tracked("verify_sizes", sizes)
    sha = sh.withColumnRenamed("doc_id", "id_a")
    shb = sh.withColumnRenamed("doc_id", "id_b")
    shared = (
        candidates.join(sha, "id_a")
        .join(shb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn(
            "jaccard",
            duck_round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by normalized-content fingerprint:
    (fp, canonical_id = min doc_id, n_copies)."""
    return (
        docs.select("doc_id", F.expr(f"md5({NORM_SPARK})").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_sql() -> str:
    return f"""
        SELECT md5({NORM_DUCK}) AS fp,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float, df_limit: int | None = None
) -> DataFrame:
    """Document pairs (a < b) with word-3-gram Jaccard ≥ ``threshold``.

    ``df_limit``: drop shingles appearing in more than this many documents
    before the join (stop-shingle skew guard; None = exact)."""
    sh = doc_shingles(docs)
    if df_limit is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_limit)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")  # inner join keeps only rare shingles
    # The intersection size |A ∩ B| falls straight out of the inverted-
    # index join: each co-occurring shingle contributes one (id_a, id_b)
    # row, so ONE shuffle join + ONE pair-keyed aggregation yields
    # `shared` directly. (The candidates→distinct→re-join-the-shingles
    # detour _jaccard_verify runs for LSH-produced candidates would scan
    # and join the shingle stream a second time for no benefit here.)
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # one row per document — persist so the na and nb joins reuse one
    # materialization instead of re-running the shingle scan + agg twice
    # (Catalyst does not CSE a repeated aggregate subtree). Keyed per
    # df_limit: the folded gate entry holds the exact AND capped
    # variants in one plan, and they must not evict each other before
    # execution.
    sizes = _persist_tracked(
        f"jaccard_sizes_{df_limit}",
        sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
    )
    return (
        shared.join(
            sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            duck_round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(threshold: float, df_limit: int | None = None) -> str:
    df_filter = (
        f"WHERE shingle IN (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= {df_limit})"
        if df_limit is not None
        else ""
    )
    return f"""
        WITH {_SHINGLES_CTE_DUCK},
        shf AS (SELECT * FROM sh {df_filter}),
        sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(shared::DOUBLE / (sa.n + sb.n - shared), 4) AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(shared::DOUBLE / (sa.n + sb.n - shared), 4) >= {threshold}
    """


def ngram_containment_pairs(
    docs: DataFrame, threshold: float, df_limit: int | None = None
) -> DataFrame:
    """DIRECTED pairs (id_a, id_b, containment) with
    ``|A ∩ B| / |A| >= threshold`` — the asymmetric complement of
    :func:`ngram_jaccard_pairs`: a short excerpt quoted inside a long
    document has low Jaccard (the union is dominated by the long side)
    but containment ≈ 1, which is exactly the quote/subset/excerpt
    signal corpus curation needs (Broder's containment from the
    original resemblance paper). Same inverted-index plan — one shuffle
    join + one pair-keyed aggregation — just without the ``a < b``
    direction collapse, and dividing by |A| alone."""
    sh = doc_shingles(docs)
    if df_limit is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_limit)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # unlike the Jaccard variant the sizes table is joined exactly ONCE
    # (containment divides by |A| only) — no persist needed
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        shared.join(
            sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"),
            "id_a",
        )
        .withColumn(
            "containment", duck_round(F.col("shared") / F.col("na"), 4)
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def ngram_containment_pairs_sql(
    threshold: float, df_limit: int | None = None
) -> str:
    df_filter = (
        f"WHERE shingle IN (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= {df_limit})"
        if df_limit is not None
        else ""
    )
    return f"""
        WITH {_SHINGLES_CTE_DUCK},
        shf AS (SELECT * FROM sh {df_filter}),
        sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM shf a JOIN shf b
              ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(shared::DOUBLE / sa.n, 4) AS containment
        FROM shared
        JOIN sizes sa ON sa.doc_id = id_a
        WHERE round(shared::DOUBLE / sa.n, 4) >= {threshold}
    """


def duplicated_ngram_fraction(
    docs: DataFrame, df_threshold: int = 2
) -> DataFrame:
    """(doc_id, n_common, dup_frac) — the CROSS-document duplicated
    n-gram fraction: the share of a document's distinct 3-gram shingles
    that occur in >= ``df_threshold`` documents. The standard
    boilerplate/template signal of web-corpus curation (RefinedWeb's
    duplicated-n-gram filters; the cross-corpus complement of
    ``text_features``' WITHIN-document repetition ratio) — documents
    whose text is mostly corpus-wide passages are navigation chrome,
    license headers, or spam templates. Docs with fewer than 3 tokens
    are EXCLUDED from the shingle stream and report (0, 0.0) — the
    shared ``SHINGLES_SPARK`` fold gives such docs a whole-text
    degenerate shingle (deliberate for exact/MinHash dedup, where two
    identical 2-token docs SHOULD match), but counting that fold here
    would brand every repeated short doc 100% cross-corpus boilerplate
    (code-review r8).

    Scale shape: shingle df is one hash aggregation on the 53-bit
    shingle key; attaching it back is a LINEAR inverted-index
    equi-join (each (doc, shingle) row matches exactly one df row —
    no pair fan-out, so unlike :func:`ngram_jaccard_pairs` no
    stop-shingle cap is needed), then one per-doc aggregation. The
    shingle explode runs twice (df build + join side) — the usual
    recompute-vs-materialize call; persist the exploded table when
    composing with other shingle consumers."""
    # bind the tokenization ONCE and filter on the bound column — a
    # docs.filter(size(TOKENS_SPARK) >= 3) wrapper would re-run the
    # regex split as a second expression on every row (the module's
    # 6x-measured re-evaluation trap; code-review r8)
    toks = docs.select("doc_id", F.expr(TOKENS_SPARK).alias("toks")).filter(
        F.expr("size(toks) >= 3")
    )
    sh = toks.select(
        "doc_id", F.explode(F.expr(SHINGLES_SPARK)).alias("shingle")
    )
    df_t = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per = (
        sh.join(df_t, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(
                F.when(F.col("df") >= df_threshold, 1).otherwise(0)
            ).alias("n_common"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
        F.coalesce(
            duck_round(F.col("n_common") / F.col("n_sh").cast("double"), 4),
            F.lit(0.0),
        ).alias("dup_frac"),
    )


def duplicated_ngram_fraction_sql(df_threshold: int = 2) -> str:
    """DuckDB twin of :func:`duplicated_ngram_fraction` — same shingle
    CTE (restricted to >=3-token docs), same single division and
    rounding."""
    return f"""
        WITH {_SHINGLES_CTE_DUCK},
        eligible AS (
            SELECT doc_id FROM documents WHERE len({TOKENS_DUCK}) >= 3
        ),
        shf AS (
            SELECT * FROM sh WHERE doc_id IN (SELECT doc_id FROM eligible)
        ),
        dft AS (SELECT shingle, count(*) AS df FROM shf GROUP BY 1),
        per AS (
            SELECT s.doc_id, count(*) AS n_sh,
                   sum(CASE WHEN f.df >= {df_threshold} THEN 1 ELSE 0 END) AS n_common
            FROM shf s JOIN dft f ON s.shingle = f.shingle
            GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(p.n_common, 0)::BIGINT AS n_common,
               COALESCE(round(p.n_common / p.n_sh::DOUBLE, 4), 0.0) AS dup_frac
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# The shingle is already an integer hash (SHINGLES_SPARK fold) — the
# minhash base value is just its reduction mod P.
_HASH_SPARK = f"shingle % {MINHASH_P}"
_HASH_DUCK = f"shingle % {MINHASH_P}"


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, m0..m{PERMS-1}) — one aggregation pass; each permutation
    is a `min` monoid so Spark computes all 32 with map-side partials."""
    from timeseries_db_spark.functions.hashing import MINHASH_AB

    sh = doc_shingles(docs).withColumn("h", F.expr(_HASH_SPARK))
    # r17 (guide §5, driver latency): each Column-API call is one py4j
    # round trip; building 32 permutation aggregates through ~8 calls
    # each cost ~0.5s of DRIVER wall per plan build (cProfile: the
    # listcomp dominated dedup_clusters'/dedup_minhash_lsh's build
    # phase). One SQL string per aggregate parses in a single JVM call —
    # the parsed expression tree (literal * h + literal) % literal is
    # identical, so plans and results are unchanged.
    aggs = [
        F.expr(f"min(({a} * h + {b}) % {MINHASH_P}) AS m{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    # r18: the per-doc distinct-shingle count rides the SAME aggregation
    # as a 33rd monoid (shingles are distinct per doc by construction —
    # array_distinct in SHINGLES_SPARK — so count(1) == the |A| the
    # Jaccard verify needs). The verify then reads sizes from the
    # signature table instead of re-scanning/re-aggregating the shingle
    # stream twice per invocation.
    aggs.append(F.expr("count(1) AS n_sh"))
    return sh.groupBy("doc_id").agg(*aggs)


def _band_key_spark(band: int) -> str:
    cols = ", ".join(
        f"CAST(m{band * MINHASH_ROWS + r} AS STRING)" for r in range(MINHASH_ROWS)
    )
    return f"md5(concat_ws('_', {cols}))"


def _band_key_duck(band: int) -> str:
    cols = ", ".join(
        f"m{band * MINHASH_ROWS + r}::VARCHAR" for r in range(MINHASH_ROWS)
    )
    return f"md5(concat_ws('_', {cols}))"


def minhash_band_table(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) — all ``MINHASH_BANDS`` band keys of a
    signature table in ONE projection + explode (a per-band union would
    recompute the signature aggregation once per band). Shared by the
    batch LSH self-join below and the streaming incremental index
    (``streaming/corpus_ingest.py``)."""
    # one-string parse (see minhash_signatures' r17 py4j note)
    structs = ", ".join(
        f"struct({band} AS band, {_band_key_spark(band)} AS bkey)"
        for band in range(MINHASH_BANDS)
    )
    return sig.select(
        "doc_id", F.expr(f"explode(array({structs}))").alias("bk")
    ).select("doc_id", "bk.band", "bk.bkey")


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float, *, persist_pairs: bool = True
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact
    shingle Jaccard: (id_a, id_b, jaccard ≥ threshold). Candidate pairs
    collide in ≥1 of the 8 bands — join fan-out is per-bucket, never
    all-pairs."""
    # Signatures are one row of 32 longs per document — the smallest table
    # in the pipeline at any scale — so persist them across the self-join
    # (each side of a self-join recomputes its input plan otherwise, and
    # that input here is the full shingle+hash+aggregate pass).
    sig = _persist_tracked("minhash", minhash_signatures(docs))
    bands = minhash_band_table(sig)
    a = bands.alias("a")
    bb = bands.alias("b")
    # per-invocation persist: the candidate pair set is referenced by
    # the id projection, the shared-count join and (transitively) every
    # shingle/size subtree below — without it the band self-join
    # re-executed 4-5× per invocation (measured; AQE exchange reuse
    # does not fire across these branches)
    candidates = _persist_fresh(
        "minhash_cand",
        a.join(bb, on=["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct(),
    )
    # exact-Jaccard verification of candidates only. r18: the verify
    # shingles ONLY the candidate documents — doc_shingles is a
    # per-document map, so filtering docs to the candidate-id set first
    # (a tiny broadcast semi-join; near-dup density bounds it) yields
    # exactly the shingles the shared/size joins consume, replacing two
    # full-corpus shingle passes with two candidate-only ones
    # (guide §2.3: project/filter before the exchange; the
    # corpus_contamination split-before-shingle precedent).
    ids = (
        candidates.select(F.col("id_a").alias("doc_id"))
        .union(candidates.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    # same per-invocation treatment: consumed by the shared join (×2)
    # and the size aggregation (×2)
    cand_sh = _persist_fresh(
        "minhash_cand_sh", doc_shingles(docs.join(F.broadcast(ids), "doc_id"))
    )
    # sizes come straight off the signature cache (the n_sh monoid rides
    # the signature aggregation, r18) — no shingle re-scan for |A|/|B|
    pairs = _jaccard_verify(
        cand_sh,
        candidates,
        threshold,
        sizes=sig.select("doc_id", F.col("n_sh").alias("n")),
    )
    if not persist_pairs:
        # r18 (ADVICE r17): the GATE/BENCH entry for dedup_minhash_lsh
        # must recompute its final result per invocation — returning the
        # persisted pair frame directly would make bench repeats time a
        # cache read of the entry's own result. The signature cache above
        # remains the shared artifact (an index, not the result).
        return pairs
    # The VERIFIED pair set is persist-tracked for the CONSUMERS that use
    # it as an input artifact (r7): it is the expensive part of the plan
    # (band self-join + verify), it is tiny by construction (near-dup
    # density), and the same (docs, threshold) plan feeds dedup_clusters'
    # iterative components loop (which references it once per iteration)
    # and curate_corpus in one session/gate sweep — one materialization
    # serves them. Those entries recompute THEIR results per invocation.
    return _persist_tracked("minhash_pairs", pairs)


def minhash_lsh_pairs_sql(threshold: float) -> str:
    mins = ",\n               ".join(
        f"min({minhash_value_sql('h', i)}) AS m{i}" for i in range(MINHASH_PERMS)
    )
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {band} AS band, {_band_key_duck(band)} AS bkey FROM sig"
        for band in range(MINHASH_BANDS)
    )
    return f"""
        WITH {_SHINGLES_CTE_DUCK},
        hashed AS (SELECT doc_id, {_HASH_DUCK} AS h FROM sh),
        sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
        bands AS ({band_rows}),
        candidates AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        shared AS (
            SELECT c.id_a, c.id_b, count(*) AS shared
            FROM candidates c
            JOIN sh sa ON sa.doc_id = c.id_a
            JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(shared::DOUBLE / (za.n + zb.n - shared), 4) AS jaccard
        FROM shared
        JOIN sizes za ON za.doc_id = id_a
        JOIN sizes zb ON zb.doc_id = id_b
        WHERE round(shared::DOUBLE / (za.n + zb.n - shared), 4) >= {threshold}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_TOKEN_HASH_SPARK = "CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT)"
_TOKEN_HASH_DUCK = md5_long_sql("token")

_SIMHASH_BAND_BITS = 15
_SIMHASH_N_BANDS = SIMHASH_BITS // _SIMHASH_BAND_BITS  # 4


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 60-bit SimHash over whitespace tokens (token
    frequency = weight). One explode + one aggregation pass (60 sum
    monoids), then a bit-assembly projection."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("token")
    ).withColumn("h", F.expr(_TOKEN_HASH_SPARK))
    # one-string parse per bit-sum (see minhash_signatures' r17 py4j
    # note — this listcomp was ~0.6s of driver wall per build through
    # the Column API, ×2 builds per dedup_simhash invocation)
    aggs = [
        F.expr(f"sum((shiftright(h, {b}) & 1) * 2 - 1) AS s{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_bit = toks.groupBy("doc_id").agg(*aggs)
    assemble = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(SIMHASH_BITS)
    )
    return per_bit.select("doc_id", F.expr(assemble).alias("simhash"))


def simhash_signatures_sql() -> str:
    # hash once per token in the CTE — inlining _TOKEN_HASH_DUCK into
    # each of the 60 bit-sums would recompute the md5 60× per token
    sums = ",\n               ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS token FROM documents
        ),
        hashed AS (SELECT doc_id, {_TOKEN_HASH_DUCK} AS h FROM toks),
        per_bit AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id)
        SELECT doc_id, {assemble} AS simhash FROM per_bit
    """


def simhash_signatures_cached(docs: DataFrame) -> DataFrame:
    """Persist-tracked :func:`simhash_signatures` — one materialization
    serves the pair join's self-join AND any caller that also needs the
    signature rows themselves (the folded ``dedup_simhash`` gate entry
    unions sig rows with pair rows; without the shared cache the
    60-monoid aggregation pass would run twice per invocation)."""
    return _persist_tracked("simhash", simhash_signatures(docs))


def banded_hamming_pairs(
    sig: DataFrame,
    *,
    id_col: str,
    sig_col: str,
    n_bands: int,
    band_bits: int,
    max_hamming: int,
) -> DataFrame:
    """Generic banded-Hamming self-join: all pairs (id_a < id_b) whose
    integer signatures differ in ≤ ``max_hamming`` bits, found WITHOUT
    an all-pairs comparison by splitting each signature into ``n_bands``
    contiguous ``band_bits``-bit keys — pigeonhole guarantees any pair
    within Hamming ≤ ``n_bands - 1`` collides on ≥ 1 band. One explode
    emits every band key in a single pass; the join fans out only
    within (band, key) buckets; ``bit_count(xor)`` verifies exactly.
    Serves both the 60-bit text SimHash (4×15) and the 56-bit image
    dHash (4×14, ``operators/multimodal.py``)."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {n_bands}-band "
            f"recall bound (pigeonhole guarantees collisions only for "
            f"Hamming <= {n_bands - 1})"
        )
    # one-string parse (see minhash_signatures' r17 py4j note)
    structs = ", ".join(
        f"struct({i} AS band, ({sig_col} div {1 << (i * band_bits)})"
        f" % {1 << band_bits} AS bkey)"
        for i in range(n_bands)
    )
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        F.expr(f"explode(array({structs}))").alias("bk"),
    ).select("_id", "_sig", "bk.band", "bk.bkey")
    a = bands.alias("a")
    bb = bands.alias("b")
    return (
        a.join(bb, on=["band", "bkey"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.expr("bit_count(a._sig ^ b._sig)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(docs: DataFrame, max_hamming: int) -> DataFrame:
    """Pairs (a < b) with SimHash Hamming distance ≤ ``max_hamming``,
    found by banding the 60-bit signature into 4×15-bit keys (any pair
    within Hamming ≤ 3 must agree on ≥1 band — pigeonhole). The persist
    keeps the tiny (doc_id, simhash) table cached across its self-join
    (see the minhash note)."""
    return banded_hamming_pairs(
        simhash_signatures_cached(docs),
        id_col="doc_id",
        sig_col="simhash",
        n_bands=_SIMHASH_N_BANDS,
        band_bits=_SIMHASH_BAND_BITS,
        max_hamming=max_hamming,
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs: every document in
    ``pairs`` labeled with its cluster's canonical id (the component's
    minimum doc_id) — the step that turns any pair-producing detector
    (exact, Jaccard, MinHash-LSH, SimHash, embedding) into an actual
    corpus dedup decision. Returns (doc_id, cluster_id).

    Thin shim over :func:`operators.graph.connected_components` (the
    single implementation: min-label propagation + pointer jumping,
    lineage-truncated per round — see that module for the scale
    analysis); this name is kept for the detector-level API surface.
    """
    from timeseries_db_spark.operators.graph import connected_components

    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        max_iter=max_iter,
    )
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def dedup_corpus(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """The end-to-end dedup decision: drop every clustered document
    except its cluster's canonical (minimum doc_id) — documents in no
    pair survive untouched. One broadcast-friendly anti-join of the
    (tiny) non-canonical id set against the corpus."""
    losers = (
        duplicate_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    return docs.join(losers, on="doc_id", how="left_anti")


def simhash_pairs_sql(max_hamming: int) -> str:
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"(simhash // {1 << (i * _SIMHASH_BAND_BITS)}) % {1 << _SIMHASH_BAND_BITS} AS bkey "
        "FROM sig"
        for i in range(_SIMHASH_N_BANDS)
    )
    inner = simhash_signatures_sql()
    return f"""
        WITH sig AS ({inner}),
        bands AS ({band_rows})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# exact-substring scrub (duplicated-span removal)
# ---------------------------------------------------------------------------

#: Window width for the duplicated-span scrub. Wider than the Jaccard
#: shingle (3): the scrub REWRITES text, so the mark must be a span long
#: enough that sharing it across documents is evidence of copying, not
#: phrase coincidence (Lee et al. 2021 use 50 BPE tokens at web scale;
#: 5 words is the same idea scaled to the fixture's ~35-word docs).
SCRUB_W = 5


def _positional_shingles(k: int):
    """(spark_expr, duck_fold) for POSITIONAL width-``k`` shingles over a
    pre-bound token-hash array ``hs`` — unlike ``SHINGLES_SPARK`` these
    keep every start offset (no array_distinct) because the consumer
    needs to know WHERE the duplicated span sits, not just that it
    exists."""
    spark_fold = _shingle_fold([f"hs[i+{j}]" for j in range(k)])
    duck_fold = _shingle_fold([f"h[i+{j}]" for j in range(k)])
    spark_expr = f"""
        transform(
          sequence(0, size(hs) - {k}),
          i -> struct(i AS start, {spark_fold} AS shingle)
        )
    """
    return spark_expr, duck_fold


def scrub_duplicated_spans(
    docs: DataFrame, k: int = SCRUB_W, df_threshold: int = 2
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, clean_text) — CROSS-document
    exact-substring deduplication, the scalable approximation of
    suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every token covered by
    a width-``k`` shingle that occurs in >= ``df_threshold`` DISTINCT
    documents is removed, and the survivors are rejoined in order.
    Within-document repetition alone never triggers removal (distinct-doc
    frequency, not raw frequency) — that signal belongs to
    ``text_features``' repetition ratio. Documents shorter than ``k``
    tokens contribute no shingles and pass through verbatim (their
    duplication is exact-dedup's job, where whole-doc identity is the
    right granularity).

    ``clean_text`` is the single-space rejoin of surviving tokens (the
    tokenizer's whitespace normalization is already lossy, so the rejoin
    is the canonical form both engines agree on); emptied docs yield ''.

    Scale shape (100 TB): positional shingling is a map-only O(L)
    explode; the duplicated-shingle set is ONE hash aggregation on the
    53-bit shingle key (count DISTINCT doc_id — partial aggregation
    combines map-side); marking is a linear inverted-index equi-join
    (each (doc, start) row matches at most one duplicated-shingle row);
    coverage expansion fans out a bounded k rows per mark; the rebuild
    is one anti-join plus one per-doc aggregation. No pair fan-out
    anywhere — the quadratic all-pairs shape of suffix-array dedup is
    exactly what this formulation avoids. A corpus-wide stop-shingle
    (df in millions) inflates only the LINEAR join, and its coverage
    rows collapse via the per-(doc,pos) distinct."""
    sh_expr, _ = _positional_shingles(k)
    toks = docs.select("doc_id", F.expr(TOKENS_SPARK).alias("toks"))
    hs = toks.filter(F.expr(f"size(toks) >= {k}")).select(
        "doc_id", F.expr(_TOK_HASHES_SPARK).alias("hs")
    )
    # the positional shingle table feeds BOTH the duplicated-set
    # aggregate and the coverage join — persist it or the tokenize +
    # shingle explode runs once per consumer (the module's measured
    # re-evaluation trap; code-review r8)
    sh = _persist_tracked(
        f"scrub_sh_{k}",
        hs.select("doc_id", F.explode(F.expr(sh_expr)).alias("sp")).select(
            "doc_id",
            F.col("sp.start").alias("start"),
            F.col("sp.shingle").alias("shingle"),
        ),
    )
    dup = (
        sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= df_threshold)
        .select("shingle")
    )
    covered = (
        sh.join(dup, "shingle")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(start, start + {k - 1})")).alias("pos"),
        )
        .distinct()
    )
    tok_rows = toks.filter(F.col("toks").isNotNull()).select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    kept = tok_rows.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x.tok,
            ),
            " ",
        ).alias("clean_text"),
    )
    # per-doc token counts derive from the SAME posexplode stream the
    # rebuild consumes (count(tok_rows) == size(toks) for any non-NULL
    # toks, including the empty-string token of '' text), so the base
    # frame costs a docs-keyed count instead of a third tokenize scan;
    # NULL-text docs have no tok_rows and fall out of the left join
    sizes = tok_rows.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    return (
        docs.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            (
                F.coalesce(F.col("n_tokens"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
            F.when(F.col("n_tokens").isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("clean_text"), F.lit("")))
            .alias("clean_text"),
        )
    )


def scrub_duplicated_spans_sql(k: int = SCRUB_W, df_threshold: int = 2) -> str:
    """DuckDB twin of :func:`scrub_duplicated_spans` — 1-based list
    positions (engine-internal only; positions never reach the output),
    ``string_agg(... ORDER BY pos)`` for the ordered rejoin."""
    _, duck_fold = _positional_shingles(k)
    return f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_DUCK} AS t FROM documents
            WHERE text IS NOT NULL
        ),
        hsrc AS (
            SELECT doc_id, t,
                   list_transform(
                     t, tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT
                   ) AS h
            FROM toks
        ),
        sh AS (
            SELECT doc_id, i AS start, {duck_fold} AS shingle
            FROM hsrc, LATERAL unnest(generate_series(1, len(h) - {k} + 1)) AS u(i)
            WHERE len(h) >= {k}
        ),
        dup AS (
            SELECT shingle
            FROM (SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1)
            WHERE df >= {df_threshold}
        ),
        covered AS (
            SELECT DISTINCT sh.doc_id, p AS pos
            FROM sh JOIN dup USING (shingle),
                 LATERAL unnest(generate_series(sh.start, sh.start + {k - 1})) AS v(p)
        ),
        tok_rows AS (
            SELECT doc_id, i AS pos, t[i] AS tok
            FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
        ),
        kept AS (
            SELECT tr.doc_id, tr.pos, tr.tok
            FROM tok_rows tr ANTI JOIN covered c
              ON tr.doc_id = c.doc_id AND tr.pos = c.pos
        ),
        rebuilt AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(len(t.t), 0)::BIGINT AS n_tokens,
               (COALESCE(len(t.t), 0) - COALESCE(r.n_kept, 0))::BIGINT AS n_removed,
               CASE WHEN t.doc_id IS NULL THEN NULL
                    ELSE COALESCE(r.clean_text, '') END AS clean_text
        FROM documents d
        LEFT JOIN toks t ON d.doc_id = t.doc_id
        LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, n_paras, n_dropped, clean_text) — GLOBAL exact
    paragraph deduplication with document rewrite (r14): the
    RefinedWeb/FineWeb pipeline step between whole-document exact
    dedup and span scrubbing. Documents split on blank lines; a
    paragraph whose trimmed text already appeared in an EARLIER
    position of the corpus (ordered by ``(doc_id, para_idx)`` — the
    deterministic arrival order) is dropped, the first occurrence
    everywhere is kept, and the survivors are rejoined with a blank
    line. Whitespace-only paragraphs never count and never survive
    (they are separators, not content).

    Scale shape (100 TB): split+posexplode is map-only O(L); the
    first-occurrence decision is ONE ``row_number`` window partitioned
    by the paragraph hash — a shuffle on the 128-bit key with no pair
    fan-out, the same key-partitioned shape as exact_dedup — and the
    rebuild is one per-doc ordered aggregation. Boilerplate paragraphs
    with huge duplicate counts skew only their own hash partition;
    AQE skew-join handling applies, and the window computes a plain
    rank (no cross-row state beyond the sort)."""
    paras = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.coalesce(F.col("text"), F.lit("")),
                                 r"\n\n")).alias("pos", "para"),
        )
        .withColumn("ptrim", F.expr("trim(para)"))
        .filter(F.col("ptrim") != "")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("ptrim"))).orderBy("doc_id", "pos")
    marked = paras.withColumn("rn", F.row_number().over(w))
    rebuilt = (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_dropped"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "  CASE WHEN rn = 1 THEN struct(pos, ptrim) END)),"
                " s -> s.ptrim), '\n\n')"
            ).alias("clean_text"),
        )
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def paragraph_dedup_sql(source_sql: str = "SELECT * FROM documents") -> str:
    """DuckDB twin of :func:`paragraph_dedup` — the same split, the
    same global first-occurrence rule, the same ordered rejoin."""
    return f"""
        WITH src AS ({source_sql}),
        plists AS (
            SELECT doc_id,
                   string_split(coalesce(text, ''), chr(10) || chr(10))
                       AS pl
            FROM src
        ),
        paras AS (
            SELECT doc_id, i - 1 AS pos, trim(pl[i]) AS ptrim
            FROM plists,
                 LATERAL unnest(generate_series(1, len(pl))) AS u(i)
            WHERE trim(pl[i]) <> ''
        ),
        marked AS (
            SELECT doc_id, pos, ptrim,
                   row_number() OVER (
                       PARTITION BY md5(ptrim) ORDER BY doc_id, pos
                   ) AS rn
            FROM paras
        ),
        rebuilt AS (
            SELECT doc_id,
                   count(*) AS n_paras,
                   sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dropped,
                   string_agg(CASE WHEN rn = 1 THEN ptrim END,
                              chr(10) || chr(10) ORDER BY pos)
                       AS clean_text
            FROM marked GROUP BY 1
        )
        SELECT s.doc_id,
               COALESCE(r.n_paras, 0)::BIGINT AS n_paras,
               COALESCE(r.n_dropped, 0)::BIGINT AS n_dropped,
               COALESCE(r.clean_text, '') AS clean_text
        FROM src s LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
    """
