"""Corpus-management operators for training-data pipelines over the
``documents`` table: deterministic train/valid/test splitting and
benchmark-contamination checking.

The reference engine (adrianotm/timeseries-db) has no corpus surface;
these extend the SURVEY.md §2.6 pipeline family (dedup, text analysis,
similarity) with the two operations every pretraining-data pipeline runs
before and after those: carving held-out splits and proving the training
split does not contain the benchmark.

Engine portability: the split is a pure function of ``md5(key)`` — both
Spark and DuckDB produce the same lowercase-hex digest for the same UTF-8
string, and both compare strings bytewise by default — so the DuckDB
oracle reproduces the exact membership, not just the split sizes.

Scale design (100 TB):

* **split** — stateless map-only projection (one md5 + two string
  compares per row); no shuffle, no state, trivially parallel, and
  stable under re-partitioning, backfills, and incremental appends
  (membership depends only on the key, never on row order or file
  layout).
* **contamination** — the benchmark side is small by construction
  (held-out split, or an external eval set), so its distinct shingles
  are broadcast: the training corpus streams through a map-side hash
  join, never shuffling on the shingle. The only exchange is the final
  per-document count, which partial-aggregates map-side. Contrast with
  the naive shingle-keyed join of two 100 TB corpora — that is the
  n-gram-Jaccard shape (operators/dedup.py) and is only needed when
  BOTH sides are large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_div, duck_round

from timeseries_db_spark.operators.dedup import doc_shingles, _SHINGLES_CTE_DUCK

# Split boundaries on the first 4 hex chars of md5(key): 16^4 = 65536
# buckets; 0xcccd/0x10000 ≈ 80.0%, 0xe666/0x10000 ≈ 90.0%. Bytewise
# string comparison over lowercase hex is identical in Spark and DuckDB.
SPLIT_TRAIN_UB = "cccd"  # h4 <  'cccd'  → train (~80%)
SPLIT_VALID_UB = "e666"  # h4 <  'e666'  → valid (~10%); rest → test


def _split_col(key: Column) -> Column:
    h4 = F.substring(F.md5(key.cast("string")), 1, 4)
    return (
        F.when(h4 < SPLIT_TRAIN_UB, "train")
        .when(h4 < SPLIT_VALID_UB, "valid")
        .otherwise("test")
    )


def _split_sql(key_expr: str) -> str:
    return (
        f"CASE WHEN substr(md5(CAST({key_expr} AS VARCHAR)), 1, 4) "
        f"< '{SPLIT_TRAIN_UB}' THEN 'train' "
        f"WHEN substr(md5(CAST({key_expr} AS VARCHAR)), 1, 4) "
        f"< '{SPLIT_VALID_UB}' THEN 'valid' ELSE 'test' END"
    )


def assign_splits(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """(doc_id, split, n_chars) — deterministic hash split of the corpus.

    ``split ∈ {train, valid, test}`` is a pure function of the key, so
    the assignment is reproducible across runs, engines, partitionings,
    and incremental loads — the property a training pipeline needs so a
    document never migrates between splits when the corpus grows."""
    return docs.select(
        "doc_id",
        _split_col(F.col(key)).alias("split"),
        "n_chars",
    )


def assign_splits_sql(key: str = "doc_id") -> str:
    return (
        f"SELECT doc_id, {_split_sql(key)} AS split, n_chars FROM documents"
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    shard_docs: int = 1000,
) -> DataFrame:
    """(doc_id, shard, n_tokens, seq_id, tok_offset) — concat-and-chunk
    sequence packing, the standard pretraining layout: documents are
    laid end-to-end in key order and cut into fixed ``budget_tokens``
    windows; a document starting at global token offset ``s`` lands in
    sequence ``s // budget`` at in-sequence offset ``s % budget`` (long
    documents straddle into the following sequence(s)).

    Scale design: a single global cumulative sum would serialize the
    corpus through one task, so the corpus packs per *shard* of
    ``shard_docs`` consecutive keys — embarrassingly parallel, and the
    layout is reproducible because shard membership and in-shard order
    are pure functions of the key. Sequence ids are (shard, seq_id)
    pairs; each shard wastes at most one partial tail sequence, which is
    negligible at any real shard size. The cumulative sum runs over
    int64 token counts (exact), one shuffle on the shard key."""
    from timeseries_db_spark.operators.text import TOKENS_SPARK

    from pyspark.sql import Window

    t = docs.select(
        "doc_id",
        F.expr(f"size({TOKENS_SPARK})").cast("long").alias("n_tokens"),
    ).withColumn("shard", duck_div(F.col("doc_id"), shard_docs))
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    t = t.select("doc_id", "shard", "n_tokens", start)
    return t.select(
        "doc_id",
        "shard",
        "n_tokens",
        duck_div(F.col("_start"), budget_tokens).alias("seq_id"),
        (F.col("_start") % budget_tokens).alias("tok_offset"),
    )


def pack_sequences_sql(budget_tokens: int = 2048, shard_docs: int = 1000) -> str:
    from timeseries_db_spark.operators.text import TOKENS_DUCK

    return f"""
        WITH t AS (
            SELECT doc_id, len({TOKENS_DUCK})::BIGINT AS n_tokens,
                   doc_id // {shard_docs} AS shard
            FROM documents
        ),
        c AS (
            -- sum(BIGINT) is HUGEINT in DuckDB; cast back so the wire
            -- types match Spark's int64 exactly
            SELECT doc_id, shard, n_tokens,
                   (sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                   ) - n_tokens)::BIGINT AS s
            FROM t
        )
        SELECT doc_id, shard, n_tokens,
               (s // {budget_tokens})::BIGINT AS seq_id,
               (s % {budget_tokens})::BIGINT AS tok_offset
        FROM c
    """


def chunk_documents(
    docs: DataFrame, max_tokens: int = 128, stride: int = 96
) -> DataFrame:
    """(doc_id, chunk_idx, tok_start, tok_len) — sliding context-window
    chunking, the other standard pretraining layout next to
    :func:`pack_sequences`: each document is cut into windows of up to
    ``max_tokens`` tokens starting every ``stride`` tokens (overlap =
    ``max_tokens - stride``); the final window is the remainder. Chunk
    starts are the multiples of ``stride`` below the token count, so
    ``chunk_idx = tok_start // stride`` — closed form in both engines.

    Scale: token counting is the same map-only expression the text
    operators use; the expansion is JVM ``sequence``/``explode`` — no
    shuffle, no Python, embarrassingly parallel per document."""
    from timeseries_db_spark.operators.text import TOKENS_SPARK

    t = docs.select(
        "doc_id",
        F.expr(f"size({TOKENS_SPARK})").cast("long").alias("n_tokens"),
    )
    return (
        t.filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.expr(f"sequence(0L, n_tokens - 1, CAST({stride} AS LONG))")
            ).alias("tok_start"),
        )
        .select(
            "doc_id",
            F.expr(f"tok_start div {stride}").alias("chunk_idx"),
            "tok_start",
            F.least(
                F.lit(max_tokens).cast("long"),
                F.col("n_tokens") - F.col("tok_start"),
            ).alias("tok_len"),
        )
    )


def chunk_documents_sql(max_tokens: int = 128, stride: int = 96) -> str:
    from timeseries_db_spark.operators.text import TOKENS_DUCK

    return f"""
        WITH t AS (
            SELECT doc_id, len({TOKENS_DUCK})::BIGINT AS n_tokens
            FROM documents
        ),
        e AS (
            SELECT doc_id, n_tokens,
                   unnest(range(0, n_tokens, {stride}))::BIGINT AS tok_start
            FROM t WHERE n_tokens > 0
        )
        SELECT doc_id, (tok_start // {stride})::BIGINT AS chunk_idx,
               tok_start,
               least({max_tokens}, n_tokens - tok_start)::BIGINT AS tok_len
        FROM e
    """


def _frac_to_hex_ub(frac: float) -> str | None:
    """Upper bound in the 4-hex-digit hash domain for a keep-fraction;
    None means "keep everything" (a 5-char bound like '10000' would
    compare WRONG bytewise against 4-char digests). Fractions snap to
    the nearest 1/65536 grid point (so the realized fraction can differ
    from the request by at most 2^-17; tiny positive fractions round to
    the nearest bucket count rather than silently truncating to zero)."""
    ub = int(round(frac * 65536))
    if ub >= 65536:
        return None
    return format(max(0, ub), "04x")


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal with embedded quotes escaped."""
    return "'" + s.replace("'", "''") + "'"


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    key: str = "doc_id",
    stratum: str = "lang",
) -> DataFrame:
    """(doc_id, lang) — deterministic per-stratum downsampling: keep a
    different fraction of each stratum (the standard rebalancing move
    when one language/domain dwarfs the rest of a training corpus).

    Membership is a pure function of ``md5('sample:' || key)`` — salted
    so it is independent of [[assign_splits]]' hash domain (the same
    document must not be systematically favored by both) — making the
    sample reproducible across runs, engines, partitionings, and
    incremental appends. Map-only: one md5 + one string compare per
    row, no shuffle, no driver state; at 100 TB this is a free rider
    on whatever scan produces the rows."""
    h4 = F.substring(F.md5(F.concat(F.lit("sample:"), F.col(key).cast("string"))), 1, 4)
    ub = _frac_to_hex_ub(default_fraction)
    default_branch = F.lit(True) if ub is None else (h4 < ub)
    if fractions:
        # NULL strata fall through to the default fraction (a bare
        # NOT IN would evaluate to NULL and silently drop them)
        others = (
            F.col(stratum).isNull() | ~F.col(stratum).isin(*sorted(fractions))
        ) & default_branch
    else:
        others = default_branch
    cond = others
    for s in sorted(fractions):
        ub = _frac_to_hex_ub(fractions[s])
        branch = F.lit(True) if ub is None else (h4 < ub)
        cond = cond | ((F.col(stratum) == s) & branch)
    return docs.filter(cond).select("doc_id", stratum)


def stratified_sample_sql(
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    key: str = "doc_id",
    stratum: str = "lang",
) -> str:
    h4 = f"substr(md5('sample:' || CAST({key} AS VARCHAR)), 1, 4)"
    parts = []
    for s in sorted(fractions):
        ub = _frac_to_hex_ub(fractions[s])
        branch = "TRUE" if ub is None else f"{h4} < '{ub}'"
        parts.append(f"({stratum} = {_sql_str(s)} AND {branch})")
    ub = _frac_to_hex_ub(default_fraction)
    default_branch = "TRUE" if ub is None else f"{h4} < '{ub}'"
    if fractions:
        in_list = ", ".join(_sql_str(s) for s in sorted(fractions))
        parts.append(
            f"(({stratum} IS NULL OR {stratum} NOT IN ({in_list})) "
            f"AND {default_branch})"
        )
    else:
        parts.append(f"({default_branch})")
    return (
        f"SELECT doc_id, {stratum} FROM documents WHERE "
        + " OR ".join(parts)
    )


def _tppm_case(targets_ppm: dict[str, int], stratum: str) -> Column:
    """CASE mapping stratum -> its integer target share (ppm); 0 for
    strata outside the target mix."""
    c = F.lit(0)
    for s_name in sorted(targets_ppm):
        c = F.when(
            F.col(stratum) == s_name, F.lit(int(targets_ppm[s_name]))
        ).otherwise(c)
    return c


def mixture_resample(
    docs: DataFrame,
    targets_ppm: dict[str, int],
    stratum: str = "lang",
    weight: str = "n_chars",
) -> DataFrame:
    """(doc_id, lang) — resample the corpus toward a TARGET mixture:
    given per-stratum target shares (integer ppm), compute each
    stratum's keep-rate so the surviving ``weight`` mass is
    proportional to the targets, then keep documents by the salted
    deterministic hash (the [[stratified_sample]] recipe with a
    DATA-DERIVED rate instead of a configured one). The
    domain/language rebalancing move of LM data work (CCNet's language
    shares, DoReMi-style domain reweighting) — downsample-only:
    ``rate[s] = K · target[s] / actual[s]`` with ``K = min_s
    actual[s]/target[s]``, so the binding stratum keeps rate 1 and
    no stratum is upsampled. Strata absent from the target mix drop
    entirely (rate 0).

    Engine-exact without a guard band on the rate MATH: actual masses
    are exact BIGINT sums, targets are integer literals, and the
    keep test is ``md5_long('mix:'||doc_id) % 65536 <
    floor(((K·tppm)/aw)·65536)`` — both engines evaluate the
    IDENTICAL double expression tree, so the threshold integer is
    bit-identical even where the product sits near a floor boundary.
    The binding (argmin) stratum's threshold is pinned to 65536
    explicitly — ``(aw/tppm)·tppm/aw`` can round to just under 1.0 in
    IEEE doubles, which would silently drop 1/65536 of the stratum the
    downsample-only invariant promises to keep whole (code-review r8);
    the argmin test ``aw/tppm = K`` is itself an exact double
    comparison, identical in both engines.

    Scale: per-stratum masses are one map-side-combined aggregation
    onto |strata| rows; K is a scalar over that tiny frame; the
    thresholds broadcast back onto the corpus — map-only on the fact
    side, no corpus shuffle, no driver collect."""
    from timeseries_db_spark.functions.hashing import md5_long

    tppm = _tppm_case(targets_ppm, stratum)
    per = (
        docs.groupBy(stratum)
        .agg(F.sum(weight).alias("aw"))
        .withColumn("tppm", tppm)
        .filter(F.col("tppm") > 0)
    )
    k = per.agg(
        F.min(F.col("aw").cast("double") / F.col("tppm")).alias("k")
    )
    thr = per.crossJoin(F.broadcast(k)).select(
        stratum,
        F.when(
            F.col("aw").cast("double") / F.col("tppm") == F.col("k"),
            F.lit(65536),
        )
        .otherwise(
            F.floor(
                ((F.col("k") * F.col("tppm")) / F.col("aw")) * F.lit(65536)
            )
        )
        .alias("thr"),
    )
    u16 = (
        md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
        % 65536
    )
    return (
        docs.join(F.broadcast(thr), stratum)
        .filter(u16 < F.col("thr"))
        .select("doc_id", stratum)
    )


def mixture_resample_sql(
    targets_ppm: dict[str, int],
    stratum: str = "lang",
    weight: str = "n_chars",
) -> str:
    """DuckDB twin of :func:`mixture_resample` — identical CASE,
    aggregation, scalar-K, and threshold expression trees."""
    from timeseries_db_spark.functions.hashing import md5_long_sql

    case = "CASE"
    for s_name in sorted(targets_ppm):
        case += f" WHEN {stratum} = {_sql_str(s_name)} THEN {int(targets_ppm[s_name])}"
    case += " ELSE 0 END"
    h = md5_long_sql("('mix:' || CAST(doc_id AS VARCHAR))")
    return f"""
        WITH per AS (
            SELECT {stratum}, sum({weight})::BIGINT AS aw, {case} AS tppm
            FROM documents GROUP BY {stratum}
        ),
        perf AS (SELECT * FROM per WHERE tppm > 0),
        kk AS (SELECT min(aw::DOUBLE / tppm) AS k FROM perf),
        thr AS (
            SELECT {stratum},
                   CASE WHEN aw::DOUBLE / tppm = kk.k THEN 65536
                        ELSE floor(((kk.k * tppm) / aw) * 65536)::BIGINT
                   END AS thr
            FROM perf, kk
        )
        SELECT d.doc_id, d.{stratum}
        FROM documents d JOIN thr t ON d.{stratum} = t.{stratum}
        WHERE {h} % 65536 < t.thr
    """


def weighted_sample_priority() -> Column:
    """The RAW (unrounded) Efraimidis-Spirakis priority ``-ln(u)/w``
    over (doc_id, n_chars) — shared between :func:`weighted_sample`
    and the guard-band pytest so the ln()-seam margin check always
    covers the shipped expression (salt, +1 offset, 2^60 divisor)."""
    from timeseries_db_spark.functions.hashing import md5_long

    u = (
        md5_long(
            F.concat(F.lit("wsample:"), F.col("doc_id").cast("string"))
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    w = (F.col("n_chars") + F.lit(1)).cast("double")
    return -F.log(u) / w


def weighted_sample(
    docs: DataFrame, k: int = 25, stratum: str = "lang"
) -> DataFrame:
    """(doc_id, lang) — per-stratum weighted sampling WITHOUT
    replacement, k items per stratum with inclusion probability
    proportional to document length (the Efraimidis-Spirakis
    exponential-sort: priority ``-ln(u)/w`` ascending, ``u`` uniform,
    ``w = n_chars + 1``) — the curation move that downsamples a corpus
    while keeping the long-document mass a plain uniform sample would
    decimate.

    Deterministic AND engine-portable "randomness": ``u`` derives from
    the salted 60-bit md5 of the doc id (same recipe as
    [[stratified_sample]]), so the sample is reproducible across runs,
    engines, and partitionings. The ranking priority is ROUNDED to 9
    decimals with a doc_id tiebreak — the IVF rounded-ranking
    discipline: both engines' ~1-ulp ln() disagreement (≤1e-14 here)
    sits five orders of magnitude under the quantum, and the pytest
    guard-band asserts the fixture's priorities AND each stratum's
    k-boundary gap keep that margin.

    Scale: one map-only projection (hash + ln), one per-stratum top-k
    window over BOUNDED strata (languages/domains); for an unbounded
    stratum key, swap the window for the shard-top-k merge of
    `similarity.cosine_topk`."""
    from pyspark.sql import Window

    pri = duck_round(weighted_sample_priority(), 9)
    ranked = docs.select("doc_id", stratum, pri.alias("pri")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(stratum).orderBy(
                F.asc("pri"), F.asc("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rn") <= k).select("doc_id", stratum)


def weighted_sample_sql(k: int = 25, stratum: str = "lang") -> str:
    """DuckDB twin of :func:`weighted_sample` (same hash, same
    expression tree, same rounded-priority ranking)."""
    from timeseries_db_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("('wsample:' || CAST(doc_id AS VARCHAR))")
    return f"""
        WITH pri AS (
            SELECT doc_id, {stratum},
                   round(-ln(({h}::DOUBLE + 1.0) / {float(1 << 60)})
                         / (n_chars + 1)::DOUBLE, 9) AS pri
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, {stratum},
                   row_number() OVER (PARTITION BY {stratum}
                                      ORDER BY pri ASC, doc_id ASC) AS rn
            FROM pri
        )
        SELECT doc_id, {stratum} FROM ranked WHERE rn <= {k}
    """


def curation_topk(docs: DataFrame, k: int = 10, stratum: str = "lang") -> DataFrame:
    """(doc_id, lang, quality, rnk) — keep the ``k`` highest-quality
    documents of every stratum (quality-based curation: the per-domain
    "best of" cut that follows scoring in a training-data pipeline).

    One shuffle on the stratum key for the window rank; the quality
    score itself is the map-only expression of
    ``operators/text.quality_score``. Ties break on doc_id so the cut
    is total-ordered and reproducible. At 100 TB the stratum count is
    small and skew lands on the biggest language — if a single stratum
    outgrows a task, swap the window for TakeOrderedAndProject per
    stratum via repartition+sortWithinPartitions; at today's k this
    window is state-bounded per task anyway."""
    from pyspark.sql import Window

    from timeseries_db_spark.operators.text import quality_score

    scored = quality_score(docs, keep=(stratum,)).select(
        "doc_id", stratum, "quality"
    )
    w = Window.partitionBy(stratum).orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def curation_topk_sql(k: int = 10, stratum: str = "lang") -> str:
    from timeseries_db_spark.operators.text import quality_score_sql

    return f"""
        WITH q AS ({quality_score_sql(keep=(stratum,))}),
        r AS (
            SELECT doc_id, {stratum}, quality,
                   (row_number() OVER (
                       PARTITION BY {stratum}
                       ORDER BY quality DESC, doc_id
                   ))::BIGINT AS rnk
            FROM q
        )
        SELECT doc_id, {stratum}, quality, rnk FROM r WHERE rnk <= {k}
    """


def benchmark_contamination(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """(doc_id, n_shared) — for every *train*-split document, the number
    of its distinct word 3-gram shingles that also occur anywhere in the
    *test* (benchmark) split. Zero-overlap train docs are absent.

    The decontamination decision rule sits on top: drop or flag train
    docs whose ``n_shared`` exceeds a threshold relative to their
    shingle count. The test side's distinct shingle set is broadcast
    (benchmarks are small); the train side never shuffles on the
    shingle."""
    # r17 (guide §1.2, don't compute what you throw away): shingle each
    # side AFTER its split filter — the old shape shingled the FULL
    # corpus once per branch (the split filter sat above the explode,
    # and Catalyst does not push a join-derived filter below it), i.e.
    # 2 complete shingle passes where train+test docs need only ~1; dev
    # docs are no longer shingled at all. doc_shingles is per-document
    # map-only, so shingles-of-a-filtered-corpus == filtered shingles —
    # values identical.
    splits = assign_splits(docs, key).select("doc_id", "split")
    tagged = docs.join(splits, "doc_id")
    eval_sh = (
        doc_shingles(tagged.filter(F.col("split") == "test"))
        .select("shingle")
        .distinct()
    )
    train_sh = doc_shingles(tagged.filter(F.col("split") == "train"))
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        # doc_shingles is distinct per document → count(*) == distinct count
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


#: Bloom sketch defaults: 2^23 bits (1 MiB packed) × 5 hash functions —
#: fpp ≈ (1 - e^(-5n/m))^5 ≈ 0.02 at n = 1M benchmark shingles
#: (~10 bits/item would be needed for 1%; 2% is fine for a pre-filter
#: whose hits are exact-verified downstream).
BLOOM_NUM_BITS = 1 << 23
BLOOM_NUM_HASHES = 5


def benchmark_contamination_bloom(
    docs: DataFrame,
    *,
    num_bits: int = BLOOM_NUM_BITS,
    num_hashes: int = BLOOM_NUM_HASHES,
    key: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_flagged) — the BOUNDED-SKETCH scale path for
    decontamination: fold the test split's distinct shingles into a
    Bloom filter packed as a ``(word_idx, bits)`` table of int64 words
    (``bit_or`` aggregation; ≤ ``num_bits``/64 rows — 1 MiB at the
    defaults — NO MATTER how many shingles the benchmark has), then
    probe every train shingle with ``num_hashes`` map-side broadcast
    joins against that table plus bit tests. Versus the exact
    broadcast-join detector (:func:`benchmark_contamination`), whose
    broadcast grows with the benchmark's distinct-shingle count, the
    sketch's size is a CONSTANT chosen up front — the standard trade a
    100 TB pipeline makes when the benchmark suite itself is large.
    (Spark's own ``bloom_filter_agg`` is not in PySpark's registered
    routine list, so the packing is spelled in plain DataFrame ops —
    same semantics, and the probe stays whole-stage-codegen'd.)

    Contract (asserted in ``tests/test_corpus.py``): NO false negatives
    — a truly shared shingle always finds all its bits set, so
    ``n_flagged >= n_shared`` per document and every contaminated doc
    appears; false positives are bounded by the sketch fpp.
    Probabilistic overcount means no exact DuckDB oracle — the exact
    detector stays the gate entry; this is the documented scale escape
    hatch, pytest-pinned against it."""
    splits = assign_splits(docs, key).select("doc_id", "split")
    sh = doc_shingles(docs).join(splits, "doc_id")

    def positions(col: str) -> list:
        # k independent 64-bit hashes → bit positions in [0, num_bits)
        return [
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]

    bits = (
        sh.filter(F.col("split") == "test")
        .select("shingle")
        .distinct()
        .select(F.explode(F.array(*positions("shingle"))).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    probe = sh.filter(F.col("split") == "train").select("doc_id", "shingle")
    for i, pos in enumerate(positions("shingle")):
        w = F.broadcast(
            bits.select(
                F.col("word_idx").alias(f"w{i}"), F.col("bits").alias(f"b{i}")
            )
        )
        probe = probe.withColumn(f"p{i}", pos).join(
            w, (F.col(f"p{i}") / 64).cast("long") == F.col(f"w{i}"), "left"
        )
    hit = None
    for i in range(num_hashes):
        test = F.expr(
            f"coalesce(b{i}, CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(p{i} % 64 AS INT)) != 0"
        )
        hit = test if hit is None else (hit & test)
    return (
        probe.filter(hit)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_flagged"))
    )


def benchmark_contamination_sql(key: str = "doc_id") -> str:
    return f"""
        WITH {_SHINGLES_CTE_DUCK},
        s AS (SELECT doc_id, {_split_sql(key)} AS split FROM documents),
        tagged AS (SELECT sh.doc_id, shingle, split FROM sh JOIN s USING (doc_id)),
        ev AS (SELECT DISTINCT shingle FROM tagged WHERE split = 'test'),
        tr AS (SELECT doc_id, shingle FROM tagged WHERE split = 'train')
        SELECT doc_id, count(*) AS n_shared
        FROM tr JOIN ev USING (shingle)
        GROUP BY doc_id
    """


def curate_corpus(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    max_contamination: int = 3,
) -> DataFrame:
    """End-to-end curation decision — the composition a pretraining
    pipeline actually ships, built entirely from the operators above:

    1. **quality gate** — heuristic score ≥ ``min_quality``
       (:func:`text.quality_score`; map-only),
    2. **near-dup removal** — MinHash-LSH pairs → connected components,
       keep only each cluster's canonical doc
       (:func:`dedup.minhash_lsh_pairs` + :func:`graph.dedup_clusters`),
    3. **decontamination** — drop train-split docs sharing more than
       ``max_contamination`` shingles with the benchmark (test) split
       (:func:`benchmark_contamination`; broadcast join),
    4. **split assignment** — the deterministic salted split
       (:func:`assign_splits`).

    Returns one row per input document with the full bookkeeping:
    (doc_id, split, quality, is_dup_loser, n_shared, kept) — ``kept``
    is the final verdict, the others explain it. Per-stage plan shapes
    (and their 100 TB behavior) are documented on the underlying
    operators; this function adds NO new shuffle beyond theirs, and the
    decision columns compose as left joins against bounded or
    per-doc-row tables."""
    from timeseries_db_spark.operators.graph import dedup_clusters
    from timeseries_db_spark.operators.text import quality_score

    q = quality_score(docs).select("doc_id", "quality")
    losers = (
        dedup_clusters(docs, jaccard_threshold)
        .filter(~F.col("keep"))
        .select("doc_id", F.lit(True).alias("is_dup_loser"))
    )
    contamination = benchmark_contamination(docs).select("doc_id", "n_shared")
    splits = assign_splits(docs).select("doc_id", "split")
    return (
        docs.select("doc_id")
        .join(splits, "doc_id")
        .join(q, "doc_id", "left")
        .join(losers, "doc_id", "left")
        .join(contamination, "doc_id", "left")
        .select(
            "doc_id",
            "split",
            "quality",
            F.coalesce(F.col("is_dup_loser"), F.lit(False)).alias("is_dup_loser"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (
                (F.col("quality") >= min_quality)
                & ~F.coalesce(F.col("is_dup_loser"), F.lit(False))
                & (
                    (F.col("split") != "train")
                    | (F.coalesce(F.col("n_shared"), F.lit(0)) <= max_contamination)
                )
            ).alias("kept"),
        )
    )


def curate_corpus_sql(
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    max_contamination: int = 3,
) -> str:
    """DuckDB twin of :func:`curate_corpus`, composed from the SQL twins
    of its component stages — the integration seams (split →
    contamination → dedup-keep → quality → verdict) are exactly what
    this oracle pins (r6 VERDICT item 4)."""
    from timeseries_db_spark.operators.graph import dedup_clusters_sql
    from timeseries_db_spark.operators.text import quality_score_sql

    return f"""
        WITH q AS (SELECT doc_id, quality FROM ({quality_score_sql()})),
        losers AS (
            SELECT doc_id, TRUE AS is_dup_loser
            FROM ({dedup_clusters_sql(jaccard_threshold)}) c
            WHERE NOT keep
        ),
        cont AS (SELECT * FROM ({benchmark_contamination_sql()}) b),
        sp AS (SELECT doc_id, {_split_sql("doc_id")} AS split FROM documents)
        SELECT d.doc_id, sp.split, q.quality,
               coalesce(l.is_dup_loser, FALSE) AS is_dup_loser,
               coalesce(cont.n_shared, 0)::BIGINT AS n_shared,
               (q.quality >= {min_quality}
                AND NOT coalesce(l.is_dup_loser, FALSE)
                AND (sp.split <> 'train'
                     OR coalesce(cont.n_shared, 0) <= {max_contamination})
               ) AS kept
        FROM documents d
        JOIN sp USING (doc_id)
        LEFT JOIN q ON q.doc_id = d.doc_id
        LEFT JOIN losers l ON l.doc_id = d.doc_id
        LEFT JOIN cont ON cont.doc_id = d.doc_id
    """


def source_reputation(
    docs: DataFrame, min_mean_quality: float = 0.5
) -> DataFrame:
    """(doc_id, source, quality, src_mean, kept) — SOURCE-level (domain-
    style) filtering, the step between per-document scoring and
    training-set assembly: a source whose MEAN heuristic quality falls
    below the threshold is dropped wholesale (spam domains poison even
    their individually-passable pages; cf. C4 / Gopher's domain
    blocklists, built from exactly this per-domain aggregate).

    Scale: per-source means are one hash aggregation with map-side
    partials over the map-only :func:`~timeseries_db_spark.operators.
    text.quality_score` projection; the source table is tiny (domains ≪
    documents) and broadcasts back onto the stream — no corpus-sized
    shuffle. Determinism: the mean divides an exact DECIMAL sum of the
    4-decimal quality doubles by an exact count, then ``duck_round``s —
    partition-order independent and engine-exact, so the kept/dropped
    decision hashes identically (fixture means keep ≥ 6e-4 clearance
    from the default threshold)."""
    from timeseries_db_spark.operators.text import quality_score

    scored = quality_score(docs, keep=("source",)).select(
        "doc_id", "source", "quality"
    )
    src = scored.groupBy("source").agg(
        duck_round(
            F.sum(F.col("quality").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("src_mean")
    )
    # eqNullSafe: documents with a NULL source form their OWN
    # reputation group instead of silently vanishing from the result
    # (a plain inner join never matches NULL keys — review r8); the
    # build side's key is renamed so the join output is unambiguous
    return (
        scored.join(
            F.broadcast(src.withColumnRenamed("source", "_src")),
            F.col("source").eqNullSafe(F.col("_src")),
        )
        .select(
            "doc_id",
            "source",
            "quality",
            "src_mean",
            (F.col("src_mean") >= min_mean_quality).alias("kept"),
        )
    )


def source_reputation_sql(min_mean_quality: float = 0.5) -> str:
    from timeseries_db_spark.operators.text import quality_score_sql

    return f"""
        WITH q AS (
            SELECT doc_id, source, quality
            FROM ({quality_score_sql(keep=("source",))})
        ),
        s AS (
            SELECT source,
                   round(sum(quality::DECIMAL(38,10))::DOUBLE / count(*), 4)
                       + 0.0 AS src_mean
            FROM q GROUP BY source
        )
        SELECT q.doc_id, q.source, q.quality, s.src_mean,
               s.src_mean >= {min_mean_quality} AS kept
        FROM q JOIN s ON q.source IS NOT DISTINCT FROM s.source
    """
