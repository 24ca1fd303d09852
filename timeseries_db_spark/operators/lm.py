"""Character-trigram language-model quality scoring — the CCNet-style
LM filter of a training-data pipeline (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020): fit a small LM on a reference corpus, score every
document by mean trigram log-probability, and filter/partition the
corpus on the score (CCNet's head/middle/tail buckets). Complements
the heuristic :func:`timeseries_db_spark.operators.text.quality_score`
— the reference engine has no text surface at all (its whole query
model is filter→group→agg over one table, ``Queries.hs:99-124``); this
belongs to the north-star LLM-pipeline surface.

Model: add-one smoothing over the bigram context::

    p(c3 | c1 c2) = (cnt(c1 c2 c3) + 1) / (cnt(c1 c2 ·) + V)

with ``V`` the corpus alphabet size (distinct third characters), over
the ``_kgram_prep``-sanitized normalized text (printable ASCII,
padded to ≥ one trigram — single-sourced engine-twin semantics).

Determinism across engines (the driver value-hashes results):

* counts are exact integers in both engines;
* each DISTINCT trigram's log-prob is quantized ONCE to fixed-point
  micro-nats (``round(1e6 * ln p)`` as BIGINT). libm ``ln`` may differ
  across engines by ~1 ulp (≈1e-10 after scaling), so
  ``tests/test_lm.py`` asserts a guard band: no quantized value in the
  fixture sits within 1e-3 of a .5 rounding boundary (the same remedy
  the round-6 ADVICE prescribed for the IVF oracle);
* a document's ``score_fp`` is a SUM OF BIGINTs — order-independent
  and exact, immune to the FP summation-order hazard of averaging
  doubles across engines;
* the final ratios divide exact integers (one IEEE op each) and
  ``duck_round`` to 4 decimals.

Scale design (100 TB):

* ONE pass over the reference corpus builds trigram counts
  (explode → hash-agg with map-side partials); the result is bounded
  by the alphabet (≤ 95³ printable-ASCII trigrams ≈ 857k rows) no
  matter the corpus size — broadcastable forever;
* bigram-context counts and ``V`` are rollups of that bounded table —
  no second corpus pass;
* scoring is explode → BROADCAST join (model side bounded) → re-agg
  by ``doc_id``: partial sums combine map-side, so the only
  corpus-sized shuffle carries one row per (partition, doc), not one
  per trigram.

Trigram extraction stays the higher-order ``transform`` form on
MEASURED evidence, not by default — see :func:`_doc_trigrams` for the
four-way comparison (HOF vs codegen'd generator vs Arrow-kernel
explode vs eager persist): when the per-window product is a row that
must exist anyway, the interpreted-lambda ceiling that
``operators/text.py``'s kernels escaped does not bind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round
from timeseries_db_spark.operators.text import (
    NORM_DUCK,
    NORM_SPARK,
    _kgram_prep,
)

#: fixed-point scale for quantized trigram log-probs (micro-nats)
LM_FP_SCALE = 1_000_000

#: ln(2) spelled as the exact IEEE double literal in BOTH engines, so
#: bits-per-char never depends on either engine's libm ln(2)
_LN2 = "0.6931471805599453e0"


def _tri_windows_spark() -> str:
    """All char-trigram windows of the prepped normalized text (Spark)."""
    return "transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))"


def _tri_windows_duck() -> str:
    return "list_transform(generate_series(1, length(s) - 2), i -> substr(s, i, 3))"


def _doc_trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, tri) — every trigram occurrence, in two staged
    projections so the normalization + sanitize bind once.

    The higher-order ``explode(transform(sequence, i -> substring))``
    form is kept DELIBERATELY — the candidate shapes were measured on
    the full self-scoring pipeline at sf0.1, first invocation (the
    driver-gate shape) / steady-state repeats:

    * HOF transform + array explode (this form): **8.6 / 5.0 s** — the
      lambda is interpreted (CodegenFallback) but runs once per doc
      over a small array, and the explode emits narrow rows;
    * codegen'd ``explode(sequence)`` + plain ``substring`` (no
      lambda): 9.8 / 6.9 s — every generated row carries the full
      document string through the generator before the projection
      prunes it;
    * Arrow-kernel explode (numpy sliding windows, the
      ``text._kgram_fp_kernel`` treatment): 10.6 / 4.9 s — unlike the
      per-doc-aggregate kernels its output is corpus-sized, so the
      exploded stream pays Arrow serialization both ways;
    * eager-persisted model (HOF + persist-tracked cache): 10.5 /
      3.4 s — wins only on repeated invocation, which the gate never
      does.

    The interpreted-HOF throughput ceiling therefore does NOT bind
    here: the per-window work product is a row that must exist anyway,
    and building it inside the JVM from a per-doc array is the
    cheapest where it counts (one invocation)."""
    s1 = docs.select("doc_id", F.expr(NORM_SPARK).alias("norm"))
    s2 = s1.select(
        "doc_id", F.expr(_kgram_prep("norm", duck=False, width=3)).alias("s")
    )
    return s2.select("doc_id", F.explode(F.expr(_tri_windows_spark())).alias("tri"))


def char_trigram_model(ref: DataFrame) -> DataFrame:
    """(tri, lp_fp) — the fitted model: one row per distinct trigram of
    the reference corpus with its quantized log-prob. Bounded by the
    alphabet regardless of corpus size."""
    tc = _doc_trigrams(ref).groupBy("tri").agg(F.count("*").alias("tri_cnt"))
    bc = tc.groupBy(F.expr("substring(tri, 1, 2)").alias("bi")).agg(
        F.sum("tri_cnt").alias("bi_cnt")
    )
    v = tc.select(
        F.countDistinct(F.expr("substring(tri, 3, 1)")).alias("vsize")
    )
    return (
        tc.withColumn("bi", F.expr("substring(tri, 1, 2)"))
        .join(F.broadcast(bc), "bi")
        .crossJoin(F.broadcast(v))
        .select(
            "tri",
            "bi_cnt",
            duck_round(
                F.expr(
                    f"{LM_FP_SCALE} * ln(CAST(tri_cnt + 1 AS DOUBLE)"
                    " / (bi_cnt + vsize))"
                ),
                0,
            )
            .cast("long")
            .alias("lp_fp"),
        )
    )


def lm_score(docs: DataFrame, ref: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_tri, score_fp, avg_logprob, bits_per_char) — mean
    trigram log-prob of every document under the model fitted on
    ``ref`` (default: the corpus itself, the self-scoring gate shape).

    When ``ref`` is a different corpus, unseen trigrams back off to the
    smoothed floor ``1 / (bi_cnt + V)`` (count 0 + add-one), where
    ``bi_cnt`` is the count of the trigram's own bigram CONTEXT — looked
    up from the bounded bigram rollup joined on ``substring(tri, 1, 2)``
    (a left join on the full trigram obviously can't deliver it — the
    model row was just missed), 0 when the context is unseen too.
    Quantized by the same fixed-point rule, row-side (both engines
    apply the identical formula, so the guard-band argument carries
    over)."""
    ref = docs if ref is None else ref
    # NOT persist-tracked, deliberately: the model's trigram-count
    # shuffle is referenced by the scoring join, the bigram rollup, and
    # the alphabet count, but Spark's ReuseExchange dedupes the
    # identical exchange across all three in a single invocation —
    # measured 5.1 s cold at sf0.1 vs 10.5 s with an eager persist
    # (the materialization pass doesn't overlap the scoring pipeline)
    model = char_trigram_model(ref)
    # the unseen-trigram floor needs the bigram-context counts and the
    # alphabet size; BOTH derive from the bounded model table (it holds
    # every distinct reference trigram with its context count), not
    # from re-scanning the reference corpus
    bi_tbl = model.groupBy(
        F.expr("substring(tri, 1, 2)").alias("bi")
    ).agg(F.max("bi_cnt").alias("ctx_cnt"))
    v = model.select(
        F.countDistinct(F.expr("substring(tri, 3, 1)")).alias("vsize")
    )
    scored = (
        _doc_trigrams(docs)
        .join(F.broadcast(model.select("tri", "lp_fp")), "tri", "left")
        .join(
            F.broadcast(bi_tbl),
            F.expr("substring(tri, 1, 2)") == F.col("bi"),
            "left",
        )
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.coalesce(
                F.col("lp_fp"),
                duck_round(
                    F.expr(
                        f"{LM_FP_SCALE} * ln(1.0e0 / (coalesce(ctx_cnt, 0) + vsize))"
                    ),
                    0,
                ).cast("long"),
            ).alias("lp_fp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tri"), F.sum("lp_fp").alias("score_fp")
    )
    return agg.select(
        "doc_id",
        "n_tri",
        "score_fp",
        duck_round(
            F.expr(f"score_fp / {LM_FP_SCALE}.0e0 / n_tri"), 4
        ).alias("avg_logprob"),
        duck_round(
            F.expr(f"-score_fp / {LM_FP_SCALE}.0e0 / n_tri / {_LN2}"), 4
        ).alias("bits_per_char"),
    )


def _doc_trigrams_sql(table: str = "documents") -> str:
    return f"""
        SELECT doc_id, unnest({_tri_windows_duck()}) AS tri
        FROM (
            SELECT doc_id, {_kgram_prep("norm", duck=True, width=3)} AS s
            FROM (SELECT doc_id, {NORM_DUCK} AS norm FROM {table})
        )
    """


def lm_score_xcorpus_sql(fit_table: str, score_table: str) -> str:
    """DuckDB twin of the CROSS-corpus :func:`lm_score` (``docs`` =
    ``score_table``, ``ref`` = ``fit_table``) — the CCNet shape, where
    the backoff actually fires: score-side trigrams absent from the
    fitted model take the smoothed floor ``1 / (ctx_cnt + V)`` with
    ``ctx_cnt`` the fit-side count of the trigram's bigram context (0
    when the context is unseen too). The floor is quantized by the SAME
    fixed-point rule as model log-probs, so every summand stays an exact
    BIGINT across engines (guard band asserted in ``tests/test_lm.py``).
    Table arguments may be parenthesized subqueries (e.g. hash-split
    slices of ``documents``)."""
    return f"""
        WITH tri_fit AS ({_doc_trigrams_sql(fit_table)}),
        tc AS (SELECT tri, count(*)::BIGINT AS tri_cnt FROM tri_fit GROUP BY tri),
        bc AS (
            SELECT substr(tri, 1, 2) AS bi, sum(tri_cnt)::BIGINT AS bi_cnt
            FROM tc GROUP BY bi
        ),
        v AS (
            SELECT count(DISTINCT substr(tri, 3, 1))::BIGINT AS vsize FROM tc
        ),
        lp AS (
            SELECT tc.tri,
                   round({LM_FP_SCALE} * ln((tc.tri_cnt + 1)::DOUBLE
                         / (bc.bi_cnt + v.vsize)))::BIGINT AS lp_fp
            FROM tc JOIN bc ON substr(tc.tri, 1, 2) = bc.bi CROSS JOIN v
        ),
        tri_sc AS ({_doc_trigrams_sql(score_table)}),
        sc AS (
            SELECT t.doc_id, count(*)::BIGINT AS n_tri,
                   sum(coalesce(
                       lp.lp_fp,
                       round({LM_FP_SCALE} * ln(1.0
                             / (coalesce(bc.bi_cnt, 0) + v.vsize)))::BIGINT
                   ))::BIGINT AS score_fp
            FROM tri_sc t
            LEFT JOIN lp ON t.tri = lp.tri
            LEFT JOIN bc ON substr(t.tri, 1, 2) = bc.bi
            CROSS JOIN v
            GROUP BY t.doc_id
        )
        SELECT doc_id, n_tri, score_fp,
               round(score_fp / {LM_FP_SCALE}.0 / n_tri, 4) AS avg_logprob,
               round(-score_fp / {LM_FP_SCALE}.0 / n_tri / {_LN2}, 4)
                   AS bits_per_char
        FROM sc
    """


def lm_score_sql(table: str = "documents") -> str:
    """DuckDB twin of the self-scoring :func:`lm_score` (ref = docs, so
    the unseen-trigram backoff never fires — every document trigram is
    by construction in the model)."""
    return f"""
        WITH tri AS ({_doc_trigrams_sql(table)}),
        tc AS (SELECT tri, count(*)::BIGINT AS tri_cnt FROM tri GROUP BY tri),
        bc AS (
            SELECT substr(tri, 1, 2) AS bi, sum(tri_cnt)::BIGINT AS bi_cnt
            FROM tc GROUP BY bi
        ),
        v AS (
            SELECT count(DISTINCT substr(tri, 3, 1))::BIGINT AS vsize FROM tc
        ),
        lp AS (
            SELECT tc.tri,
                   round({LM_FP_SCALE} * ln((tc.tri_cnt + 1)::DOUBLE
                         / (bc.bi_cnt + v.vsize)))::BIGINT AS lp_fp
            FROM tc JOIN bc ON substr(tc.tri, 1, 2) = bc.bi CROSS JOIN v
        ),
        sc AS (
            SELECT tri.doc_id, count(*)::BIGINT AS n_tri,
                   sum(lp.lp_fp)::BIGINT AS score_fp
            FROM tri JOIN lp ON tri.tri = lp.tri
            GROUP BY tri.doc_id
        )
        SELECT doc_id, n_tri, score_fp,
               round(score_fp / {LM_FP_SCALE}.0 / n_tri, 4) AS avg_logprob,
               round(-score_fp / {LM_FP_SCALE}.0 / n_tri / {_LN2}, 4)
                   AS bits_per_char
        FROM sc
    """


def lm_partition(scored: DataFrame, n_buckets: int = 3) -> DataFrame:
    """CCNet head/middle/tail partitioning (Wenzek et al. §4.4): rank
    the corpus by LM score and cut it into ``n_buckets`` equal-count
    buckets — bucket 1 = most fluent ("head"). Input is a
    :func:`lm_score` output frame.

    RANK-based, not threshold-based, deliberately: bucket boundaries
    from interpolated percentiles are doubles, and a document whose
    score sits within an ulp of a boundary could land differently
    across engines — ``ntile`` over the exact-BIGINT ``score_fp`` with
    a ``doc_id`` tiebreak is a total order both engines reproduce
    bit-for-bit (the same reason the scores are fixed-point).

    Scale: a global ntile is a single-task sort — fine for ranking a
    scored SAMPLE or a gate fixture; at corpus scale switch to
    ``approx_percentile(score_fp, ...)`` boundaries (mergeable sketch)
    and accept the boundary band being approximate, or ntile within
    hash shards when exact equal counts don't matter."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score_fp").desc(), F.col("doc_id"))
    return scored.select(
        "doc_id", F.ntile(n_buckets).over(w).alias("bucket")
    )


def lm_partition_sql(score_sql: str, n_buckets: int = 3) -> str:
    return f"""
        SELECT doc_id,
               ntile({n_buckets}) OVER (ORDER BY score_fp DESC, doc_id)
                   AS bucket
        FROM ({score_sql})
    """


def lm_partition_rank_bounds(
    scored: DataFrame, n_buckets: int = 3
) -> list[int]:
    """Engine-reproducible boundary literals for
    :func:`lm_partition_approx`'s override path: b_k = the
    ceil(k·n/n_buckets)-th largest ``score_fp`` (exact integer rank
    arithmetic, ``(k·n + nb − 1) // nb``), returned ASCENDING. A value
    at a fixed rank of a sorted multiset is deterministic even when
    ``row_number`` breaks score ties arbitrarily, so DuckDB computes
    the identical literals (:func:`lm_partition_approx_sql`). One
    count job + one ≤(nb−1)-row collect — bounded driver state. The
    global window is single-task; this rule is for gating/sampling
    scales, the sketch path is the 100 TB boundary rule."""
    from pyspark.sql import Window

    n = scored.count()
    if n == 0:
        return []
    offs = [(k * n + n_buckets - 1) // n_buckets for k in range(1, n_buckets)]
    w = Window.orderBy(F.col("score_fp").desc())
    got = {
        r["rn"]: r["score_fp"]
        for r in scored.select(
            "score_fp", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn").isin(offs))
        .collect()
    }
    return [int(got[o]) for o in sorted(offs, reverse=True)]


def lm_partition_approx_sql(score_sql: str, n_buckets: int = 3) -> str:
    """DuckDB twin of rank-exact-bounds ``lm_partition_approx``:
    identical ceil-rank boundary literals, identical strictly-greater
    CASE chain (boundary ties fall to the less-fluent bucket)."""
    ranks = list(range(1, n_buckets))
    bcols = ", ".join(
        f"max(CASE WHEN rn = ({k}*n + {n_buckets - 1}) // {n_buckets}"
        f" THEN score_fp END) AS b{k}"
        for k in ranks
    )
    whens = " ".join(
        f"WHEN sc.score_fp > b.b{k} THEN {k}" for k in ranks
    )
    return f"""
        WITH sc AS ({score_sql}),
        r AS (
            SELECT score_fp,
                   row_number() OVER (ORDER BY score_fp DESC) AS rn,
                   count(*) OVER () AS n
            FROM sc
        ),
        b AS (SELECT {bcols} FROM r)
        SELECT sc.doc_id,
               CASE {whens} ELSE {n_buckets} END AS bucket
        FROM sc, b
    """


def lm_partition_approx(
    scored: DataFrame,
    n_buckets: int = 3,
    accuracy: int = 10_000,
    bounds: list[int] | None = None,
) -> DataFrame:
    """The 100 TB twin of :func:`lm_partition`: bucket boundaries from
    ``percentile_approx`` (a mergeable sketch — map-side partials, no
    global sort, bounded driver state of ``n_buckets − 1`` scalars)
    instead of a single-task ntile. Documents then bucket by comparing
    their exact score against the collected boundary literals —
    map-only.

    The sketch boundary is approximate by design: bucket sizes are
    equal within the sketch's rank error (≈ corpus/accuracy), so the
    percentile_approx path is pytest-pinned (size balance + ≥95%
    assignment agreement with the exact form), not value-oracled.

    ``bounds`` (ascending boundary literals) overrides the sketch:
    callers that already know the cut points — or that compute them by
    an engine-reproducible rule — drive the SAME map-only assignment
    path. That is how the driver gate covers this operator (r10): the
    ``approx`` leg of ``text_lm_score`` pins rank-exact boundaries
    (the ceil(k·n/n_buckets)-th largest fixed-point score, identical
    in DuckDB) and value-hashes the threshold partition end-to-end.
    Boundary-TIED documents land by score comparison, not rank —
    deterministic under any tie ordering, and the observable semantic
    difference from :func:`lm_partition`'s ntile."""
    if bounds is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = scored.agg(
            F.percentile_approx("score_fp", qs, accuracy).alias("b")
        ).first()["b"]
    if bounds is None:  # empty corpus: mirror lm_partition's empty frame
        return scored.select(
            "doc_id", F.lit(None).cast("int").alias("bucket")
        ).filter(F.lit(False))
    # ascending quantile boundaries; build the when-chain from the
    # LOWEST bound inward so the HIGHEST bound is the outermost check:
    # score > top-bound → bucket 1 (head), … , else bucket n (tail)
    bucket = F.lit(n_buckets)
    for i, b in enumerate(bounds):
        bucket = F.when(
            F.col("score_fp") > F.lit(int(b)), n_buckets - 1 - i
        ).otherwise(bucket)
    return scored.select("doc_id", bucket.cast("int").alias("bucket"))
