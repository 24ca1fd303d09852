"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (driver north star, SURVEY.md §2.6 note):
token counting, quality scoring, language ID, document fingerprinting.

Design rules:

* everything is built-in ``pyspark.sql.functions`` / SQL expressions —
  JVM-side, whole-stage-codegen'd, no Python in the hot path;
* every operator has a DuckDB SQL twin generated from the SAME constants
  (stopword lexicons, weights), so the driver's value-hash comparison is
  exact;
* per-row work only (no shuffle at all until an aggregation is asked
  for) — at 100 TB these run map-only over however many partitions the
  scan yields.

Engine-portability notes encoded here once:
* DuckDB ``regexp_replace`` needs the ``'g'`` flag for global (Spark is
  global by default);
* Spark array subscripts are 0-based, DuckDB lists are 1-based;
* both engines' ``/`` on ints is true division, but we cast to double
  explicitly anyway.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.numeric import duck_round

# ---------------------------------------------------------------------------
# shared constants (single source of truth for Spark AND oracle SQL)
# ---------------------------------------------------------------------------

#: Tiny per-language stopword lexicons for the n-gram/stopword heuristic
#: language-ID. Deterministic and oracle-expressible; not a real LID model.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "los", "y", "es", "en", "un"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
}

#: English stopwords used by the quality score's stopword-ratio feature.
QUALITY_STOPWORDS: tuple[str, ...] = LANG_LEXICONS["en"] + ("that", "for", "on", "with")

#: quality_score = W_LEN * min(1, tokens/100) + W_STOP * stop_ratio
#:                + W_ALPHA * alpha_ratio
QUALITY_WEIGHTS = (0.3, 0.3, 0.4)

TOKENS_SPARK = r"split(trim(text), '\\s+')"
TOKENS_DUCK = r"regexp_split_to_array(trim(text), '\s+')"


def _in_list(items: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in items) + ")"


def _winner_case(scores: dict[str, str]) -> str:
    """CASE expression picking the max-score language with alphabetical
    tiebreak ('und' when every score is 0), over per-language score
    expressions — syntax shared by Spark SQL and DuckDB, so this is the
    single source of the winner rule for lang_id, lang_id_sql, and both
    sides of features()."""
    greatest = "greatest(" + ", ".join(scores[l] for l in sorted(scores)) + ")"
    case = "CASE WHEN " + greatest + " = 0 THEN 'und' "
    for lang in sorted(scores):
        case += f"WHEN {scores[lang]} = {greatest} THEN '{lang}' "
    return case + "END"


def _quality_fragments() -> dict[str, str]:
    """Unrounded SQL fragments for the quality-score outputs, over the
    staged count columns (n_tokens, stop_hits, alpha_len, text_len) —
    syntax identical in Spark SQL and DuckDB. Rounding is applied
    per-engine (duck_round vs native round) by the callers."""
    w_len, w_stop, w_alpha = QUALITY_WEIGHTS
    stop_ratio = "CAST(stop_hits AS DOUBLE) / n_tokens"
    alpha_ratio = "CAST(alpha_len AS DOUBLE) / text_len"
    # exponent-notation literals are DOUBLE in BOTH engines (a bare 0.3
    # parses as DECIMAL in both, with engine-specific promotion rules) —
    # all-double arithmetic is the same IEEE ops on both sides
    quality = (
        f"{w_len}e0 * least(1.0e0, n_tokens / 100.0e0) "
        f"+ {w_stop}e0 * ({stop_ratio}) + {w_alpha}e0 * ({alpha_ratio})"
    )
    return {"stop_ratio": stop_ratio, "alpha_ratio": alpha_ratio, "quality": quality}


# ---------------------------------------------------------------------------
# operators (Spark side)
# ---------------------------------------------------------------------------


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count per document."""
    return docs.select(
        "doc_id",
        F.expr(f"size({TOKENS_SPARK})").cast("long").alias("n_tokens"),
    )


def token_count_sql() -> str:
    return (
        f"SELECT doc_id, len({TOKENS_DUCK})::BIGINT AS n_tokens FROM documents"
    )


def quality_score(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation, stopword
    ratio, alphabetic-character ratio — the standard cheap pre-filters of
    a training-data pipeline. ``keep`` names extra input columns carried
    through unchanged (e.g. a stratum key for downstream curation).

    Staged projections: the regex split, stopword filter, and alpha-strip
    regex are each bound once; the final score is cheap arithmetic over
    those columns (inlining them would re-run each regex per reference —
    see the note on ``dedup.SHINGLES_SPARK``)."""
    toks = docs.select(
        "doc_id", *keep, "text", F.expr(TOKENS_SPARK).alias("toks")
    )
    counts = toks.select(
        "doc_id",
        *keep,
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr(
            f"size(filter(toks, t -> t IN {_in_list(QUALITY_STOPWORDS)}))"
        ).alias("stop_hits"),
        F.expr("length(regexp_replace(text, '[^a-zA-Z]', ''))").alias("alpha_len"),
        F.expr("length(text)").alias("text_len"),
    )
    q = _quality_fragments()
    return counts.select(
        "doc_id",
        *keep,
        "n_tokens",
        duck_round(F.expr(q["stop_ratio"]), 4).alias("stop_ratio"),
        duck_round(F.expr(q["alpha_ratio"]), 4).alias("alpha_ratio"),
        duck_round(F.expr(q["quality"]), 4).alias("quality"),
    )


def quality_score_sql(keep: tuple[str, ...] = ()) -> str:
    q = _quality_fragments()
    keep_sql = "".join(f"{c}, " for c in keep)
    return f"""
        WITH t AS (
            SELECT doc_id, {keep_sql} text, {TOKENS_DUCK} AS toks FROM documents
        ),
        c AS (
            SELECT doc_id, {keep_sql}
                   len(toks)::BIGINT AS n_tokens,
                   len(list_filter(toks, t -> t IN {_in_list(QUALITY_STOPWORDS)})) AS stop_hits,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_len,
                   length(text) AS text_len
            FROM t
        )
        SELECT doc_id, {keep_sql} n_tokens,
               round({q["stop_ratio"]}, 4) AS stop_ratio,
               round({q["alpha_ratio"]}, 4) AS alpha_ratio,
               round({q["quality"]}, 4) AS quality
        FROM c
    """


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID: score = stopword hits per language,
    winner by max score with alphabetical tiebreak; 'und' when no lexicon
    matches. (The fixture's texts are synthetic, so this mostly returns
    'en'/'und' — determinism and oracle parity are the point here.)"""
    # stage 1: split once, one stopword-vote column per language;
    # stage 2: winner selection over the cheap score columns
    toks = docs.select("doc_id", "lang", F.expr(TOKENS_SPARK).alias("toks"))
    scored = toks.select(
        "doc_id",
        "lang",
        *[
            F.expr(f"size(filter(toks, t -> t IN {_in_list(words)}))").alias(
                f"sc_{lang}"
            )
            for lang, words in sorted(LANG_LEXICONS.items())
        ],
    )
    case = _winner_case({l: f"sc_{l}" for l in LANG_LEXICONS})
    return scored.select("doc_id", "lang", F.expr(case).alias("pred_lang"))


def lang_id_sql() -> str:
    toks = TOKENS_DUCK
    case = _winner_case(
        {
            lang: f"len(list_filter({toks}, t -> t IN {_in_list(words)}))"
            for lang, words in LANG_LEXICONS.items()
        }
    )
    return f"SELECT doc_id, lang, {case} AS pred_lang FROM documents"


# ---------------------------------------------------------------------------
# script-class language bucketing (r14 — VERDICT item 6)
# ---------------------------------------------------------------------------

#: Unicode script ranges → script-level language buckets. The stopword
#: vote above is Latin-only (a CJK/Cyrillic/Greek/Arabic page scores 0
#: on every lexicon and lands in 'und'); counting CHARACTERS by script
#: class buckets the major non-Latin scripts correctly and is
#: oracle-expressible in both engines (the range endpoints are embedded
#: as literal characters — RE2 has no \\uXXXX escapes, the same seam as
#: ``_ZW_CHARS``). Script-level buckets, honestly named: 'ru' means
#: Cyrillic, 'zh' means Han — a real LID model distinguishes Russian
#: from Bulgarian; this pass routes pages to per-script pipelines.
SCRIPT_RANGES: dict[str, str] = {
    "ar": "؀-ۿ",  # Arabic
    "el": "Ͱ-Ͽ",  # Greek
    "he": "֐-׿",  # Hebrew
    "hi": "ऀ-ॿ",  # Devanagari
    "ja": "぀-ヿ",  # Hiragana + Katakana
    "ko": "가-힯",  # Hangul syllables
    "ru": "Ѐ-ӿ",  # Cyrillic
    "th": "฀-๿",  # Thai
    "zh": "一-鿿",  # CJK Unified (Han)
}


def _script_winner_case(latin_expr: str) -> str:
    """Winner CASE over staged ``sc_<bucket>`` count columns — shared
    Spark-SQL/DuckDB syntax. All-zero script counts fall back to the
    Latin stopword vote; Han-dominant text with ANY kana present is
    Japanese (kanji+kana is how Japanese is written — pure-Han text
    stays 'zh')."""
    bs = sorted(SCRIPT_RANGES)
    greatest = "greatest(" + ", ".join(f"sc_{b}" for b in bs) + ")"
    case = f"CASE WHEN {greatest} = 0 THEN ({latin_expr}) "
    case += f"WHEN sc_ja > 0 AND sc_zh = {greatest} THEN 'ja' "
    for b in bs:
        case += f"WHEN sc_{b} = {greatest} THEN '{b}' "
    return case + "END"


def script_lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, n_scripted, slang) — script-class language bucketing:
    count characters per Unicode script range, bucket by the dominant
    script (alphabetical tiebreak; kana presence turns Han-dominant
    text Japanese), and fall back to the Latin stopword vote
    (:func:`lang_id`'s rule, 'und' when nothing matches) for
    script-free text. ``n_scripted`` is the total count of non-Latin
    script characters. Map-only JVM expressions — nine
    ``regexp_extract_all`` counts in one staged projection.

    NULL text is coalesced to '' up front (r15 — ADVICE): Spark's
    legacy ``size(NULL) = -1`` would otherwise make every count -1 and
    hand the win to the first alphabetical bucket, while the DuckDB
    twin returned NULL — both engines now route NULL text through the
    Latin/'und' fallback identically."""
    docs = docs.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    staged = docs.select(
        "doc_id",
        *[
            F.expr(f"size(regexp_extract_all(text, '[{r}]', 0))")
            .cast("long")
            .alias(f"sc_{b}")
            for b, r in sorted(SCRIPT_RANGES.items())
        ],
        *[
            F.expr(
                f"size(filter({TOKENS_SPARK}, t -> t IN {_in_list(w)}))"
            ).alias(f"sl_{lang}")
            for lang, w in sorted(LANG_LEXICONS.items())
        ],
    )
    latin = _winner_case({lang: f"sl_{lang}" for lang in LANG_LEXICONS})
    total = " + ".join(f"sc_{b}" for b in sorted(SCRIPT_RANGES))
    return staged.select(
        "doc_id",
        F.expr(total).cast("long").alias("n_scripted"),
        F.expr(_script_winner_case(latin)).alias("slang"),
    )


def script_lang_id_sql(source_sql: str = "SELECT * FROM documents") -> str:
    """DuckDB twin of :func:`script_lang_id` — generated from the SAME
    range table and winner rule (engine parity by construction)."""
    latin = _winner_case(
        {
            lang: f"len(list_filter({TOKENS_DUCK}, t -> t IN {_in_list(w)}))"
            for lang, w in LANG_LEXICONS.items()
        }
    )
    counts = ", ".join(
        f"len(regexp_extract_all(text, '[{r}]'))::BIGINT AS sc_{b}"
        for b, r in sorted(SCRIPT_RANGES.items())
    )
    total = " + ".join(f"sc_{b}" for b in sorted(SCRIPT_RANGES))
    return f"""
        SELECT doc_id, ({total})::BIGINT AS n_scripted,
               {_script_winner_case(latin)} AS slang
        FROM (
            SELECT doc_id, text, {counts}
            FROM (
                SELECT doc_id, coalesce(text, '') AS text
                FROM ({source_sql})
            )
        )
    """


NORM_SPARK = r"trim(regexp_replace(lower(text), '\\s+', ' '))"
NORM_DUCK = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text,
    plus its 60-bit integer form (the join/dedup key used downstream)."""
    # fp_long derives from fp, so the md5 (and its regex normalization)
    # runs once per row
    fp = docs.select("doc_id", F.expr(f"md5({NORM_SPARK})").alias("fp"))
    return fp.select(
        "doc_id",
        "fp",
        F.expr("CAST(conv(substring(fp, 1, 15), 16, 10) AS BIGINT)").alias("fp_long"),
    )


def fingerprint_sql() -> str:
    return (
        f"SELECT doc_id, md5({NORM_DUCK}) AS fp, "
        f"('0x' || substr(md5({NORM_DUCK}), 1, 15))::BIGINT AS fp_long "
        "FROM documents"
    )


# ---------------------------------------------------------------------------
# BPE-ish regex token count + rolling k-gram fingerprint
# ---------------------------------------------------------------------------

#: BPE-style pre-tokenization classes (letter runs / digit runs / single
#: non-space symbols) — the character-class approximation of GPT-2's
#: pre-tokenizer, kept to constructs Java regex and RE2 treat identically.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

#: rolling k-gram width for the winnowing-style fingerprint
KGRAM = 8

#: polynomial-hash parameters for the k-gram windows: base 257 (> any
#: byte value) and the largest prime below 2**53 — h < MOD keeps
#: h * 257 + 255 < 2**62, so the fold never overflows signed 64-bit in
#: either engine. Chosen over per-window md5 because the fold is pure
#: JVM integer arithmetic inside whole-stage codegen (~2× faster on the
#: documents corpus) while staying bit-identical to the DuckDB twin.
KGRAM_BASE = 257
KGRAM_MOD = 9_007_199_254_740_881


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """Whitespace AND BPE-ish token counts side by side — the usual pair
    a data pipeline tracks (BPE-ish ≈ what a subword tokenizer would see
    before merges)."""
    toks = docs.select(
        "doc_id",
        F.expr(f"size({TOKENS_SPARK})").cast("long").alias("n_ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{BPE_PATTERN}', 0))")
        .cast("long")
        .alias("n_bpe_tokens"),
    )
    return toks


def token_count_bpe_sql() -> str:
    return f"""
        SELECT doc_id,
               len({TOKENS_DUCK})::BIGINT AS n_ws_tokens,
               len(regexp_extract_all(text, '{BPE_PATTERN}'))::BIGINT AS n_bpe_tokens
        FROM documents
    """


def _kgram_unrolled(first: str, nth) -> str:
    """The ``KGRAM``-term polynomial fold, unrolled: ``nth(j)`` is the
    code of the j-th character of the window (j in 1..KGRAM-1),
    ``first`` the 0th. Shared shape for the Spark and DuckDB twins so
    the arithmetic stays single-sourced."""
    h = first
    for j in range(1, KGRAM):
        h = f"(({h}) * {KGRAM_BASE} + {nth(j)}) % {KGRAM_MOD}"
    return h


def _kgram_prep(col: str, *, duck: bool, width: int = KGRAM) -> str:
    """ASCII-sanitize + pad ``col`` so window semantics agree across
    engines: non-printable-ASCII codepoints (where Spark's UTF-16-based
    char functions and DuckDB's codepoint-based ones can disagree)
    collapse to '?', and strings shorter than one window are
    space-padded to exactly ``width`` chars (rpad TRUNCATES longer
    strings in both engines, hence the CASE guard). Spark SQL string
    literals eat one level of backslash (DuckDB's don't), so the regex
    spelling is per-engine. ``width`` defaults to the fingerprint
    ``KGRAM``; the trigram LM (``operators/lm.py``) uses 3."""
    if duck:
        a = f"regexp_replace({col}, '[^\\x20-\\x7E]', '?', 'g')"
    else:
        a = f"regexp_replace({col}, '[^\\\\x20-\\\\x7E]', '?')"
    return f"CASE WHEN length({a}) < {width} THEN rpad({a}, {width}, ' ') ELSE {a} END"


def _kgram_hashes_spark(col: str) -> str:
    """Spark SQL expr: 53-bit polynomial hash of every ``KGRAM``-char
    window of ``col`` (short strings are padded to one window).

    The character codes bind ONCE as a lambda variable (the one-element
    ``array(...)`` + ``transform(..., cs -> ...)`` + ``[0]`` idiom —
    Spark has no LATERAL-style let inside a projection), then each
    window is an 8-term integer fold over ``cs`` — no per-window string
    allocation, no md5, fully inside whole-stage codegen."""
    codes = f"transform(split({_kgram_prep(col, duck=False)}, ''), c -> CAST(ascii(c) AS BIGINT))"
    fold = _kgram_unrolled("cs[i-1]", lambda j: f"cs[i+{j}-1]")
    return f"""
        transform(
          array({codes}),
          cs -> transform(sequence(1, size(cs) - {KGRAM - 1}), i -> {fold})
        )[0]
        """


def _kgram_hashes_duck(col: str) -> str:
    """DuckDB twin of :func:`_kgram_hashes_spark` — bit-identical output
    (same sanitize/pad, same fold; verified over ASCII, accented,
    CJK and astral-plane inputs)."""
    fold = _kgram_unrolled(
        "ascii(substr(s, i, 1))::BIGINT",
        lambda j: f"ascii(substr(s, i+{j}, 1))",
    )
    return f"""
        list_transform(
          [{_kgram_prep(col, duck=True)}],
          s -> list_transform(generate_series(1, length(s) - {KGRAM - 1}), i -> {fold})
        )[1]
        """


#: Per-sub-block character budget for `_kgram_fp_kernel`. The fold's
#: int64 temporaries are ~8 B/char × 3 live arrays; 256k chars keeps the
#: working set ≈ 6 MB — inside L2/L3 on every deployment target. Without
#: blocking, the kernel's throughput tracks the ARROW batch size: at the
#: session's 10k-row batches a 300-char-avg corpus makes ~1.5M-char
#: buffers whose 12 MB temporaries fall out of cache (measured 12× slower
#: per element on this box's DRAM), so text_features regressed 4× when
#: r17 moved Arrow batching from a 1,024-row cap to byte-bounded 10k
#: (guide §4.2: keep vectorized working sets cache-sized regardless of
#: how the engine slices batches).
KGRAM_BLOCK_CHARS = 256 * 1024


def _kgram_fp_kernel(prepped) -> "pd.DataFrame":  # noqa: F821
    """Vectorized twin of :func:`_kgram_hashes_spark` reduced to the
    ``(n_kgrams, min_fp)`` pair, over a pandas Series of ALREADY
    ``_kgram_prep``-ed strings (printable ASCII, length ≥ ``KGRAM``).

    Why this exists: Spark's higher-order functions (``transform`` /
    ``aggregate``) are ``CodegenFallback`` — every window evaluates the
    8-term fold as an interpreted expression tree, measured ~600 ns per
    character (≈ 1.7 MB/s/core: a genuine scan-throughput ceiling at
    100 TB). This kernel concatenates the batch into ONE byte buffer and
    runs the identical fold as 8 vectorized int64 ops over the whole
    batch (~1 ns/char), masking out the windows that straddle document
    boundaries via per-doc offsets. Same ``KGRAM_BASE``/``KGRAM_MOD``
    arithmetic, int64 throughout (MOD < 2**53 so ``h*257+126 < 2**62``
    — no numpy overflow), hence bit-identical to the SQL/DuckDB twins
    (asserted in ``tests/test_text.py``).

    The reduction is per-document, so the batch is processed in
    document-aligned sub-blocks of ≈ ``KGRAM_BLOCK_CHARS`` characters
    (cache-sized temporaries — see the constant's note) and the
    per-block frames concatenated: identical output for any block size.
    """
    import numpy as np
    import pandas as pd

    texts = prepped.tolist()
    total = sum(len(t) for t in texts if t is not None)
    if total > 2 * KGRAM_BLOCK_CHARS and len(texts) > 1:
        bounds = [0]
        chars = 0
        for i, t in enumerate(texts):
            chars += len(t) if t is not None else 8
            if chars >= KGRAM_BLOCK_CHARS and i + 1 < len(texts):
                bounds.append(i + 1)
                chars = 0
        bounds.append(len(texts))
        if len(bounds) > 2:  # ≥ 2 real chunks — else fall through whole
            parts = [
                _kgram_fp_kernel(pd.Series(texts[lo:hi], dtype=object))
                for lo, hi in zip(bounds, bounds[1:])
            ]
            return pd.concat(parts, ignore_index=True)
    null_mask = [t is None for t in texts]
    safe = ["        " if m else t for t, m in zip(texts, null_mask)]
    lens = np.fromiter((len(t) for t in safe), np.int64, len(safe))
    codes = np.frombuffer("".join(safe).encode("ascii"), np.uint8).astype(np.int64)
    n_win = len(codes) - (KGRAM - 1)
    if n_win > 0:
        h = codes[:n_win].copy()
        for j in range(1, KGRAM):
            h = (h * KGRAM_BASE + codes[j : n_win + j]) % KGRAM_MOD
    else:
        h = np.empty(0, np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    n_out = np.zeros(len(safe), np.int64)
    m_out = np.zeros(len(safe), np.int64)
    for i in range(len(safe)):
        win = h[starts[i] : ends[i] - (KGRAM - 1)]
        n_out[i] = np.unique(win).size
        m_out[i] = win.min()
    out = pd.DataFrame({"n_kgrams": n_out, "min_fp": m_out})
    if any(null_mask):  # NULL in → NULL out, like the SQL twin
        out.loc[null_mask, ["n_kgrams", "min_fp"]] = None
    return out


def kgram_fp_udf():
    """Arrow-batched ``pandas_udf`` wrapping :func:`_kgram_fp_kernel`
    (built lazily — a module-level ``@pandas_udf`` would need an active
    SparkSession at import time; the inner wrapper carries the concrete
    ``pd.Series -> pd.DataFrame`` type hints pandas_udf requires)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fp(prepped: pd.Series) -> pd.DataFrame:
        return _kgram_fp_kernel(prepped)

    return pandas_udf(_fp, "n_kgrams long, min_fp long")


def _token_stats_kernel(toks) -> "pd.DataFrame":  # noqa: F821
    """Per-document token statistics, vectorized at the batch level —
    the Arrow escape hatch for the OTHER CodegenFallback higher-order
    functions in :func:`features` (lexicon membership filters, the
    sorted-run mode count, bigram dedup): measured ~0.8 s of interpreted
    expression-tree walking at sf0.1 replaced by ~0.08 s of CPython
    set/dict ops. Every output is an exact integer count — identical by
    construction to the SQL forms (same token array in, same membership
    and distinct semantics), so the DuckDB oracle twins are unchanged;
    equality with the per-feature SQL operators is asserted in
    ``tests/test_text.py::test_features_consistent_with_single_ops``.

    Columns: ``stop_hits``, ``sc_<lang>`` per :data:`LANG_LEXICONS`,
    ``n_distinct``, ``top_cnt`` (mode frequency), ``n_g2`` /
    ``n_g2_distinct`` (adjacent bigrams, total and distinct),
    ``tok_chars`` (summed token lengths). NULL token array → NULL row,
    like the SQL twins."""
    import pandas as pd

    stop = frozenset(QUALITY_STOPWORDS)
    lex = {l: frozenset(ws) for l, ws in LANG_LEXICONS.items()}
    langs = sorted(lex)
    cols: dict[str, list] = {
        c: []
        for c in ["stop_hits", *[f"sc_{l}" for l in langs], "n_distinct",
                  "top_cnt", "n_g2", "n_g2_distinct", "tok_chars"]
    }
    for ts in toks:
        if ts is None:
            for c in cols:
                cols[c].append(None)
            continue
        ts = list(ts)
        counts: dict[str, int] = {}
        chars = 0
        stop_hits = 0
        sc = dict.fromkeys(langs, 0)
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
            chars += len(t)
            if t in stop:
                stop_hits += 1
            for l in langs:
                if t in lex[l]:
                    sc[l] += 1
        cols["stop_hits"].append(stop_hits)
        for l in langs:
            cols[f"sc_{l}"].append(sc[l])
        cols["n_distinct"].append(len(counts))
        cols["top_cnt"].append(max(counts.values()) if counts else 0)
        n_g2 = max(0, len(ts) - 1)
        cols["n_g2"].append(n_g2)
        cols["n_g2_distinct"].append(
            len({(ts[i], ts[i + 1]) for i in range(n_g2)})
        )
        cols["tok_chars"].append(chars)
    return pd.DataFrame(cols)


def token_stats_udf():
    """Arrow-batched ``pandas_udf`` over the token array column wrapping
    :func:`_token_stats_kernel`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    langs = sorted(LANG_LEXICONS)
    schema = ", ".join(
        f"{c} long"
        for c in ["stop_hits", *[f"sc_{l}" for l in langs], "n_distinct",
                  "top_cnt", "n_g2", "n_g2_distinct", "tok_chars"]
    )

    def _stats(toks: pd.Series) -> pd.DataFrame:
        return _token_stats_kernel(toks)

    return pandas_udf(_stats, schema)


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """Winnowing-style rolling fingerprint: hash every ``KGRAM``-char
    window of the normalized text, keep (distinct k-gram count, minimum
    hash) — the pair MOSS-style near-dup detectors store per document.
    Staged projections: normalization + window prep bind once in SQL
    (single-sourced cross-engine semantics in ``_kgram_prep``), then the
    53-bit polynomial fold runs in the vectorized Arrow kernel (see
    :func:`_kgram_fp_kernel` for why not a SQL higher-order function).
    Still one scan, map-only, no shuffle."""
    norm = docs.select("doc_id", F.expr(NORM_SPARK).alias("norm"))
    prepped = norm.select(
        "doc_id", F.expr(_kgram_prep("norm", duck=False)).alias("kg")
    )
    fp = prepped.select("doc_id", kgram_fp_udf()(F.col("kg")).alias("kfp"))
    return fp.select(
        "doc_id",
        F.col("kfp.n_kgrams").alias("n_kgrams"),
        F.col("kfp.min_fp").alias("min_fp"),
    )


def rolling_fingerprint_sql() -> str:
    return f"""
        WITH n AS (SELECT doc_id, {NORM_DUCK} AS norm FROM documents),
        g AS (
            SELECT doc_id, {_kgram_hashes_duck("norm")} AS hashes
            FROM n
        )
        SELECT doc_id,
               len(list_distinct(hashes))::BIGINT AS n_kgrams,
               list_min(hashes) AS min_fp
        FROM g
    """


# ---------------------------------------------------------------------------
# repetition / lexical-diversity signals + PII scrubbing
# ---------------------------------------------------------------------------


def repetition_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, distinct_tok_ratio, top_tok_frac,
    dup_2gram_frac, mean_tok_len) — the Gopher-style repetition and
    lexical-diversity filters: type-token ratio, most-common-token
    fraction, duplicate word-2-gram fraction, mean token length.
    Low-diversity / high-repetition documents are the classic
    machine-generated-junk signature a pretraining pipeline drops.

    Map-only (no shuffle); the top-token count is a nested-lambda
    scan — O(distinct × total) per document, bounded by document
    length, and still cheaper than the regexes that precede it."""
    toks = docs.select("doc_id", F.expr(TOKENS_SPARK).alias("toks"))
    staged = toks.select(
        "doc_id",
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr("size(array_distinct(toks))").cast("long").alias("n_distinct"),
        # mode count via sort + run-length fold: O(n log n) + O(n),
        # vs the transform×filter form's O(n_distinct × n_tokens)
        F.expr(
            "aggregate(array_sort(toks),"
            " struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best),"
            " (s, x) -> struct(x, IF(x <=> s.prev, s.run + 1, 1L),"
            "                  greatest(s.best, IF(x <=> s.prev, s.run + 1, 1L))),"
            " s -> s.best)"
        ).cast("long").alias("top_cnt"),
        F.expr(
            "CASE WHEN size(toks) < 2 THEN CAST(array() AS array<string>) "
            "ELSE transform(sequence(0, size(toks) - 2), "
            "i -> concat_ws(' ', toks[i], toks[i+1])) END"
        ).alias("g2"),
        F.expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
        .alias("tok_chars"),
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        duck_round(F.expr("CAST(n_distinct AS DOUBLE) / n_tokens"), 4).alias(
            "distinct_tok_ratio"
        ),
        duck_round(F.expr("CAST(top_cnt AS DOUBLE) / n_tokens"), 4).alias(
            "top_tok_frac"
        ),
        duck_round(
            F.expr(
                "CASE WHEN size(g2) = 0 THEN 0.0e0 "
                "ELSE 1.0e0 - CAST(size(array_distinct(g2)) AS DOUBLE) / size(g2) END"
            ),
            4,
        ).alias("dup_2gram_frac"),
        duck_round(F.expr("CAST(tok_chars AS DOUBLE) / n_tokens"), 4).alias(
            "mean_tok_len"
        ),
    )


def repetition_signals_sql() -> str:
    return f"""
        WITH t AS (SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents),
        s AS (
            SELECT doc_id,
                   len(toks)::BIGINT AS n_tokens,
                   len(list_distinct(toks))::BIGINT AS n_distinct,
                   list_max(list_transform(list_distinct(toks),
                       x -> len(list_filter(toks, y -> y = x))))::BIGINT AS top_cnt,
                   list_transform(generate_series(1, len(toks) - 1),
                       i -> concat_ws(' ', toks[i], toks[i+1])) AS g2,
                   list_sum(list_transform(toks, t -> length(t)))::BIGINT AS tok_chars
            FROM t
        )
        SELECT doc_id, n_tokens,
               round(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS distinct_tok_ratio,
               round(CAST(top_cnt AS DOUBLE) / n_tokens, 4) AS top_tok_frac,
               round(CASE WHEN len(g2) = 0 THEN 0.0e0
                     ELSE 1.0e0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) END,
                     4) AS dup_2gram_frac,
               round(CAST(tok_chars AS DOUBLE) / n_tokens, 4) AS mean_tok_len
        FROM s
    """


#: PII patterns kept to constructs Java regex and RE2 treat identically
#: (character classes only, no backslash escapes — `[.]` instead of `\.`
#: so the same literal works in Spark SQL and DuckDB strings).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


# ---------------------------------------------------------------------------
# HTML → text extraction (r11): the step every WEB corpus runs before any
# of the features above — a real state-machine parser, not a regex strip
# ---------------------------------------------------------------------------

#: the named entities a boilerplate stripper actually meets; numeric
#: (&#33; / &#x21;) forms are handled by the parser directly
HTML_ENTITIES: dict[str, str] = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"',
    "apos": "'", "nbsp": "\xa0",
}

_HTML_DROP = ("script", "style")


def _html_tag_end(s: str, i: int) -> int | None:
    """Index just past the ``>`` closing the tag opened at ``i`` —
    quote-aware, so a ``>`` inside an attribute value doesn't end it."""
    q = None
    for j in range(i + 1, len(s)):
        ch = s[j]
        if q:
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
        elif ch == ">":
            return j + 1
    return None


def html_to_text_str(html: str) -> tuple[str, int, int]:
    """REAL HTML→text extraction (single document): drops comments and
    ``<script>``/``<style>`` content wholesale, strips every other tag
    (quote-aware attribute scan; a lone ``<`` stays literal), decodes
    named + decimal + hex entities (unknown entities stay literal),
    treats each stripped tag as a whitespace boundary, and collapses
    all whitespace (incl. NBSP) to single spaces. Returns
    ``(text, n_tags, n_entities)`` — comments are not counted as tags;
    a dropped script/style pair counts its open AND close tag."""
    import re as _re

    out: list[str] = []
    n_tags = n_ent = 0
    i, n = 0, len(html)
    lower = html.lower()
    ent_re = _re.compile(r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")
    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                j = lower.find("-->", i + 4)
                i = n if j < 0 else j + 3
                continue
            dropped = None
            for t in _HTML_DROP:
                after = i + 1 + len(t)
                if lower.startswith("<" + t, i) and (
                    after >= n or not lower[after].isalnum()
                ):
                    dropped = t
                    break
            if dropped:
                j = _html_tag_end(html, i)
                if j is None:
                    out.append("<")
                    i += 1
                    continue
                close = lower.find("</" + dropped, j)
                if close < 0:  # unterminated: everything after is dropped
                    n_tags += 1
                    i = n
                else:
                    k = _html_tag_end(html, close)
                    n_tags += 2
                    i = k if k is not None else n
                out.append(" ")
                continue
            j = _html_tag_end(html, i)
            if j is None:  # no closing '>' anywhere: literal '<'
                out.append("<")
                i += 1
                continue
            n_tags += 1
            out.append(" ")
            i = j
        elif c == "&":
            m = ent_re.match(html, i)
            dec = None
            if m:
                name = m.group(1)
                if name.startswith(("#x", "#X")):
                    code = int(name[2:], 16)
                    dec = chr(code) if code < 0x110000 else None
                elif name.startswith("#"):
                    code = int(name[1:])
                    dec = chr(code) if code < 0x110000 else None
                else:
                    dec = HTML_ENTITIES.get(name)
            if dec is not None:
                out.append(dec)
                n_ent += 1
                i = m.end()
            else:
                out.append("&")
                i += 1
        else:
            out.append(c)
            i += 1
    text = _re.sub(r"[\s\xa0]+", " ", "".join(out)).strip()
    return text, n_tags, n_ent


def html_extract(docs: DataFrame, col: str = "html") -> DataFrame:
    """(doc_id, n_tags, n_entities, text) — :func:`html_to_text_str`
    over an HTML column, Arrow-batched (one Python pass per batch,
    map-only; at 100 TB this is the same per-row posture as the other
    text kernels — no shuffle, no driver traffic)."""
    from typing import Iterator as _It

    def gen(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [html_to_text_str(x or "") for x in pdf[col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tags": [r[1] for r in rows],
                    "n_entities": [r[2] for r in rows],
                    "text": [r[0] for r in rows],
                }
            )

    return docs.select("doc_id", col).mapInPandas(
        gen, schema="doc_id long, n_tags long, n_entities long, text string"
    )


#: regex building blocks for the page-meta patterns: an attribute
#: quote class and its negation, built by concatenation so no Python
#: string-escape noise leaks into the patterns
_RQ = '["' + "']"  # ["']
_RNQ = '([^"' + "']*)"  # captured run of non-quote chars


def _page_meta_exprs(*, duck: bool, html: str = "html") -> dict[str, str]:
    """Engine-specific expression set behind :func:`html_page_meta`
    and its DuckDB twin — one source of truth (c4/gopher-style
    parity). Case-insensitivity via the ``(?i)`` flag both engines
    share; the only engine seams are backslash doubling (Spark SQL
    literals consume one level), the match predicate (``rlike`` vs
    ``regexp_matches``) and the JSON path evaluator."""

    def lit(pat: str) -> str:
        if not duck:
            pat = pat.replace("\\", "\\\\")
        return pat.replace("'", "''")

    def ex(pat: str, group: int = 1) -> str:
        return f"regexp_extract({html}, '{lit(pat)}', {group})"

    title = ex("(?i)<title[^>]*>([^<]*)</title>")
    canonical = ex(
        f"(?i)<link[^>]*rel={_RQ}canonical{_RQ}[^>]*href={_RQ}{_RNQ}"
    )
    og_title = ex(
        f"(?i)<meta[^>]*property={_RQ}og:title{_RQ}[^>]*content={_RQ}{_RNQ}"
    )
    desc = ex(
        f"(?i)<meta[^>]*name={_RQ}description{_RQ}[^>]*content={_RQ}{_RNQ}"
    )
    noindex_pat = lit(
        f"(?i)<meta[^>]*name={_RQ}robots{_RQ}[^>]*"
        f"content={_RQ}[^\"']*noindex"
    )
    noindex = (
        f"regexp_matches({html}, '{noindex_pat}')"
        if duck
        else f"{html} rlike '{noindex_pat}'"
    )
    lang = ex(f"(?i)<html[^>]* lang={_RQ}?([A-Za-z-]+)")
    ld_raw = ex(
        f"(?is)<script[^>]*type={_RQ}application/ld\\+json{_RQ}[^>]*>"
        "(.*?)</script>"
    )
    nld = lit("(?i)application/ld\\+json")
    if duck:
        # duck's json_extract_string ERRORS on empty input where
        # Spark's get_json_object returns NULL — guard the miss case
        ld_type = (
            f"CASE WHEN {ld_raw} = '' THEN NULL ELSE "
            f"json_extract_string({ld_raw}, '$.\"@type\"') END"
        )
        n_ld = f"len(regexp_extract_all({html}, '{nld}'))::BIGINT"
    else:
        ld_type = f"get_json_object({ld_raw}, \"$['@type']\")"
        n_ld = (
            f"cast(size(regexp_extract_all({html}, '{nld}', 0)) as long)"
        )
    return {
        "title": title,
        "canonical": canonical,
        "og_title": og_title,
        "desc_len": f"CAST(length({desc}) AS BIGINT)",
        "noindex": noindex,
        "lang": lang,
        "ld_type": ld_type,
        "n_jsonld": n_ld,
    }


_PAGE_META_COLS = (
    "title", "canonical", "og_title", "desc_len", "noindex", "lang",
    "ld_type", "n_jsonld",
)


def html_page_meta(docs: DataFrame, col: str = "html") -> DataFrame:
    """(doc_id, title, canonical, og_title, desc_len, noindex, lang,
    ld_type, n_jsonld) — the page-level METADATA a crawl pipeline
    reads before (and alongside) text extraction (r13): the <title>,
    the rel=canonical URL (the dedup authority signal), the OpenGraph
    title, meta-description length, the meta-robots NOINDEX flag (a
    page telling you not to index it should not enter a corpus — the
    in-page complement of robots.txt), the <html lang> declaration
    (a language-ID prior), and the first JSON-LD block's schema.org
    @type (via the engine's real JSON path evaluator) plus the
    JSON-LD block count.

    All JVM regexp/JSON expressions — map-only, one codegen
    projection over the page column; the DuckDB twin shares the
    expression set."""
    e = _page_meta_exprs(duck=False, html=col)
    return docs.select(
        "doc_id",
        *[
            (
                F.expr(e[c]).cast("boolean")
                if c == "noindex"
                else F.expr(e[c])
            ).alias(c)
            for c in _PAGE_META_COLS
        ],
    )


def html_page_meta_sql(source_sql: str, col: str = "html") -> str:
    """DuckDB twin of :func:`html_page_meta` over ``source_sql``."""
    e = _page_meta_exprs(duck=True, html=col)
    cols = ",\n               ".join(
        f"({e[c]}) AS {c}" if c == "noindex" else f"{e[c]} AS {c}"
        for c in _PAGE_META_COLS
    )
    return f"""
        SELECT doc_id,
               {cols}
        FROM ({source_sql})
    """


# ---------------------------------------------------------------------------
# Main-content extraction (r13, VERDICT stretch item 8): boilerplate
# removal — real pipelines rarely train on nav bars. A readability/
# jusText-style BLOCK scorer: segment the page at block-level tags,
# drop page chrome (<nav>/<header>/<footer>/<aside>) wholesale, then
# keep blocks by text length and LINK DENSITY (chars inside <a> over
# block chars — the single most effective boilerplate signal in the
# literature: menus and footers are link-dense, prose is not).
# ---------------------------------------------------------------------------

#: tags that delimit scoring blocks (flattened: an opening block tag
#: finalizes the current block — standard block segmentation)
_MCE_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td "
    "th section article main blockquote pre figure form br hr body "
    "html".split()
)
#: subtrees dropped wholesale, nesting-aware: page chrome plus the
#: document head (a <title> is metadata, not trainable page content)
_MCE_CHROME = frozenset(("nav", "footer", "aside", "header", "head",
                         "title"))

_MCE_TAGNAME_RE = None  # built lazily (module import stays light)


def main_content_str(
    html: str, min_len: int = 25, max_link_density: float = 1 / 3
) -> tuple[str, int, int]:
    """Readability-style main-content extraction for one document:
    ``(text, n_blocks, n_kept)``. One state-machine pass (same
    comment/script/style handling and entity decoding as
    :func:`html_to_text_str`): text accumulates into blocks delimited
    by block-level tags, ``<a>`` depth attributes each character to
    link text, chrome subtrees contribute nothing. A block survives
    when its collapsed text reaches ``min_len`` chars AND its link
    density (link chars / block chars, pre-collapse) stays at or
    under ``max_link_density``; survivors join with newlines.
    ``n_blocks`` counts non-empty non-chrome candidate blocks."""
    import re as _re

    global _MCE_TAGNAME_RE
    if _MCE_TAGNAME_RE is None:
        _MCE_TAGNAME_RE = _re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
    ent_re = _re.compile(
        r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);"
    )
    ws_re = _re.compile(r"[\s\xa0]+")
    blocks: list[tuple[str, int]] = []
    cur: list[str] = []
    cur_link = 0
    a_depth = 0
    chrome = 0
    i, n = 0, len(html)
    lower = html.lower()

    def flush() -> None:
        nonlocal cur, cur_link
        text = ws_re.sub(" ", "".join(cur)).strip()
        if text:
            blocks.append((text, cur_link))
        cur = []
        cur_link = 0

    def put(s: str) -> None:
        nonlocal cur_link
        if chrome:
            return
        cur.append(s)
        if a_depth:
            cur_link += len(s)

    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                j = lower.find("-->", i + 4)
                i = n if j < 0 else j + 3
                continue
            dropped = None
            for t in _HTML_DROP:
                after = i + 1 + len(t)
                if lower.startswith("<" + t, i) and (
                    after >= n or not lower[after].isalnum()
                ):
                    dropped = t
                    break
            if dropped:
                j = _html_tag_end(html, i)
                if j is None:
                    put("<")
                    i += 1
                    continue
                close = lower.find("</" + dropped, j)
                if close < 0:
                    i = n
                else:
                    k = _html_tag_end(html, close)
                    i = k if k is not None else n
                put(" ")
                continue
            j = _html_tag_end(html, i)
            if j is None:  # no closing '>' anywhere: literal '<'
                put("<")
                i += 1
                continue
            m = _MCE_TAGNAME_RE.match(html, i)
            name = m.group(1).lower() if m else ""
            closing = html.startswith("</", i)
            if name in _MCE_CHROME:
                flush()
                chrome = max(0, chrome + (-1 if closing else 1))
            elif name == "a":
                # the tag-boundary space is layout, not anchor text —
                # emit it OUTSIDE the link span so density counts only
                # the anchor's own characters
                if closing:
                    a_depth = max(0, a_depth - 1)
                    put(" ")
                else:
                    put(" ")
                    a_depth += 1
            elif name in _MCE_BLOCK_TAGS:
                flush()
            else:  # inline tag: a whitespace boundary, like html_extract
                put(" ")
            i = j
        elif c == "&":
            m = ent_re.match(html, i)
            dec = None
            if m:
                name = m.group(1)
                if name.startswith(("#x", "#X")):
                    code = int(name[2:], 16)
                    dec = chr(code) if code < 0x110000 else None
                elif name.startswith("#"):
                    code = int(name[1:])
                    dec = chr(code) if code < 0x110000 else None
                else:
                    dec = HTML_ENTITIES.get(name)
            if dec is not None:
                put(dec)
                i = m.end()
            else:
                put("&")
                i += 1
        else:
            put(c)
            i += 1
    flush()
    kept = [
        t
        for t, lc in blocks
        if len(t) >= min_len and lc <= max_link_density * len(t)
    ]
    return "\n".join(kept), len(blocks), len(kept)


def main_content_extract(
    docs: DataFrame, col: str = "html", min_len: int = 25,
    max_link_density: float = 1 / 3,
) -> DataFrame:
    """(doc_id, n_blocks, n_kept, text) — :func:`main_content_str`
    over an HTML column, Arrow-batched, map-only: the C4 sibling that
    runs BEFORE line-level cleaning in a real web pipeline (nav bars
    and footers never reach the corpus). Same 100 TB posture as
    :func:`html_extract` — per-row Python kernel, no shuffle, no
    driver traffic."""
    from typing import Iterator as _It

    def gen(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [
                main_content_str(x or "", min_len, max_link_density)
                for x in pdf[col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_blocks": [r[1] for r in rows],
                    "n_kept": [r[2] for r in rows],
                    "text": [r[0] for r in rows],
                }
            )

    return docs.select("doc_id", col).mapInPandas(
        gen, schema="doc_id long, n_blocks long, n_kept long, text string"
    )


# ---------------------------------------------------------------------------
# URL canonicalization (r11; RFC 3986-complete in r12): dedup web
# corpora by canonical URL — the companion key to content dedup
# ---------------------------------------------------------------------------

#: regexes shared by the Spark and DuckDB forms (both engines'
#: regexp_extract take (string, pattern, group)). The query regex needs
#: an engine-specific literal: Spark SQL string literals process
#: backslash escapes (so ``\?`` must be written ``\\?``) while standard
#: SQL / DuckDB literals do not — same seam as TOKENS_SPARK/TOKENS_DUCK.
URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
URL_QUERY_RE_SPARK = r"\\?([^#]*)"
URL_QUERY_RE_DUCK = r"\?([^#]*)"
URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _url_pct_norm(e: str, *, duck: bool) -> str:
    """SQL expression normalizing the percent-encodings inside URL
    component expression ``e`` (RFC 3986 §6.2.2.1-2): hex digits
    uppercased, and escapes of UNRESERVED octets (ALPHA / DIGIT /
    ``-._~``) decoded. Split on ``%``; each tail piece starts with the
    two hex digits of one escape (a piece that doesn't keeps its ``%``
    literal — malformed input passes through). Unreserved-ness is
    decided on the UPPERCASED hex pair by string range compare, which
    is order-exact for fixed-width hex, so both engines agree without
    any codepoint table."""
    h = "upper(p[1:2])" if duck else "upper(substring(p, 1, 2))"
    unres = (
        f"(({h} >= '41' AND {h} <= '5A') OR ({h} >= '61' AND {h} <= '7A')"
        f" OR ({h} >= '30' AND {h} <= '39')"
        f" OR {h} IN ('2D', '2E', '5F', '7E'))"
    )
    if duck:
        # coalesce: DuckDB's array_to_string is NULL on an EMPTY list
        # (Spark's array_join yields '') — a no-escape component must
        # pass through unchanged, not null out the whole URL
        parts = f"string_split({e}, '%')"
        return (
            f"({parts})[1] || coalesce(array_to_string(list_transform(({parts})[2:], "
            f"p -> CASE WHEN regexp_matches(p, '^[0-9A-Fa-f]{{2}}') THEN "
            f"CASE WHEN {unres} THEN chr(('0x' || {h})::INT) || p[3:] "
            f"ELSE '%' || {h} || p[3:] END "
            f"ELSE '%' || p END), ''), '')"
        )
    parts = f"split({e}, '%')"
    return (
        f"concat(element_at({parts}, 1), array_join(transform("
        f"slice({parts}, 2, greatest(size({parts}) - 1, 0)), "
        f"p -> CASE WHEN p rlike '^[0-9A-Fa-f]{{2}}' THEN "
        f"CASE WHEN {unres} THEN "
        f"concat(char(cast(conv({h}, 16, 10) as int)), substring(p, 3)) "
        f"ELSE concat('%', {h}, substring(p, 3)) END "
        f"ELSE concat('%', p) END), ''))"
    )


def _url_dot_segments(*, duck: bool) -> str:
    """SQL expression applying RFC 3986 §5.2.4 remove_dot_segments to
    column ``path_pn`` (an absolute, percent-normalized path): fold
    the ``/``-split segments left-to-right — ``.`` skips, ``..`` pops
    the last emitted segment, anything else (INCLUDING empty segments
    from ``//``) appends — then restore the trailing slash a final
    ``.``/``..`` implies, and map the empty result to ``/``. The fold
    accumulator is the path string itself (pop = drop the last
    ``/segment``), so Spark's ``aggregate`` (with a real init) and
    DuckDB's ``list_reduce`` (init simulated by a prepended ``chr(1)``
    sentinel, mapped to '' in every branch) compute identical
    results."""
    if duck:
        parts = "string_split(path_pn, '/')"
        base = "(CASE WHEN acc = chr(1) THEN '' ELSE acc END)"
        acc = (
            f"list_reduce(list_prepend(chr(1), ({parts})[2:]), "
            f"(acc, seg) -> CASE WHEN seg = '.' THEN {base} "
            f"WHEN seg = '..' THEN regexp_replace({base}, '/[^/]*$', '') "
            f"ELSE {base} || '/' || seg END)"
        )
        folded = f"(CASE WHEN ({acc}) = chr(1) THEN '' ELSE ({acc}) END)"
        closed = (
            f"(CASE WHEN ({parts})[-1] IN ('.', '..') "
            f"THEN {folded} || '/' ELSE {folded} END)"
        )
    else:
        parts = "split(path_pn, '/')"
        acc = (
            f"aggregate(slice({parts}, 2, greatest(size({parts}) - 1, 0)), "
            f"'', (acc, seg) -> CASE WHEN seg = '.' THEN acc "
            f"WHEN seg = '..' THEN regexp_replace(acc, '/[^/]*$', '') "
            f"ELSE concat(acc, '/', seg) END)"
        )
        folded = f"({acc})"
        closed = (
            f"(CASE WHEN element_at({parts}, -1) IN ('.', '..') "
            f"THEN concat({folded}, '/') ELSE {folded} END)"
        )
    return f"CASE WHEN {closed} = '' THEN '/' ELSE {closed} END"


def _url_surt(*, duck: bool) -> str:
    """SQL expression building the SURT form of columns ``host`` /
    ``path`` (r12): hostname labels reversed comma-joined (leading
    ``www.`` dropped, a non-default port re-attached after the
    labels), then ``)`` + path — the key shape the CDX crawl index
    sorts on, so canonical URLs join the index directly."""
    if duck:
        port = r"regexp_extract(host, ':(\d+)$', 1)"
        hostname = r"regexp_replace(regexp_replace(host, ':\d+$', ''), '^www\.', '')"
        rev = f"array_to_string(list_reverse(string_split({hostname}, '.')), ',')"
    else:
        port = r"regexp_extract(host, ':(\\d+)$', 1)"
        hostname = (
            r"regexp_replace(regexp_replace(host, ':\\d+$', ''),"
            r" '^www\\.', '')"
        )
        rev = f"array_join(reverse(split({hostname}, '\\\\.')), ',')"
    return (
        f"{rev} || CASE WHEN {port} != '' THEN ':' || {port} ELSE '' END"
        f" || ')' || path"
        if duck
        else f"concat({rev}, CASE WHEN {port} != '' THEN concat(':', {port})"
        f" ELSE '' END, ')', path)"
    )


def url_normalize(df: DataFrame, col: str = "url") -> DataFrame:
    """(doc_id, host, path, n_params, url_norm, surt) — RFC 3986 §6.2
    canonical URL form: scheme and host lowercased, default ports
    dropped (``:80`` http, ``:443`` https), percent-encodings
    normalized in path and params (hex uppercased, unreserved octets
    decoded — BEFORE dot-segment removal, since ``%2E`` decodes to a
    dot), dot-segments removed (``/a/./b/../c`` → ``/a/c``), empty
    path mapped to ``/``, query parameters SORTED on their normalized
    form (order-insensitive dedup key), fragment dropped, empty query
    dropped. Pure JVM expressions (regex + array HOFs + string-fold
    ``aggregate``) — map-only, no Python; the DuckDB twin
    :func:`url_normalize_sql` is generated from the same builders, so
    the canonical form is engine-exact and usable as a dedup join key
    on either side."""
    scheme = f"lower(regexp_extract({col}, '{URL_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({col}, '{URL_HOST_RE}', 1))"
    path = f"regexp_extract({col}, '{URL_PATH_RE}', 1)"
    query = f"regexp_extract({col}, '{URL_QUERY_RE_SPARK}', 1)"
    s1 = df.select(
        "doc_id",
        F.expr(scheme).alias("scheme"),
        F.expr(hostport).alias("hostport"),
        F.expr(_url_pct_norm(path, duck=False)).alias("path_pn"),
        F.expr(
            f"array_sort(transform(filter(split({query}, '&'), x -> x != ''),"
            f" x -> {_url_pct_norm('x', duck=False)}))"
        ).alias("params"),
    )
    s2 = s1.select(
        "doc_id", "scheme", "hostport", "params",
        F.expr(_url_dot_segments(duck=False)).alias("path"),
    )
    host = (
        "CASE WHEN scheme = 'http' AND hostport LIKE '%:80' "
        "THEN substring(hostport, 1, length(hostport) - 3) "
        "WHEN scheme = 'https' AND hostport LIKE '%:443' "
        "THEN substring(hostport, 1, length(hostport) - 4) "
        "ELSE hostport END"
    )
    s3 = s2.select(
        "doc_id",
        F.expr(host).alias("host"),
        "path",
        F.expr("size(params)").cast("long").alias("n_params"),
        F.expr(
            f"concat(scheme, '://', {host}, path, "
            "CASE WHEN size(params) > 0 "
            "THEN concat('?', array_join(params, '&')) ELSE '' END)"
        ).alias("url_norm"),
    )
    return s3.withColumn("surt", F.expr(_url_surt(duck=False)))


def url_normalize_sql(source_sql: str, col: str = "url") -> str:
    """DuckDB twin of :func:`url_normalize` over ``source_sql`` (a
    subquery yielding (doc_id, {col})) — generated from the same
    percent-norm / dot-segment builders, engine-exact."""
    return f"""
        WITH u1 AS (
            SELECT doc_id,
                   lower(regexp_extract({col}, '{URL_SCHEME_RE}', 1)) AS scheme,
                   lower(regexp_extract({col}, '{URL_HOST_RE}', 1)) AS hostport,
                   {_url_pct_norm(
                       f"regexp_extract({col}, '{URL_PATH_RE}', 1)", duck=True
                   )} AS path_pn,
                   list_sort(list_transform(list_filter(string_split(
                       regexp_extract({col}, '{URL_QUERY_RE_DUCK}', 1), '&'),
                       x -> x != ''),
                       x -> {_url_pct_norm('x', duck=True)})) AS params
            FROM ({source_sql})
        ),
        u2 AS (
            SELECT doc_id, scheme, hostport, params,
                   {_url_dot_segments(duck=True)} AS path
            FROM u1
        ),
        u3 AS (
            SELECT doc_id, scheme, path, params,
                   CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
                        THEN substring(hostport, 1, length(hostport) - 3)
                        WHEN scheme = 'https' AND hostport LIKE '%:443'
                        THEN substring(hostport, 1, length(hostport) - 4)
                        ELSE hostport END AS host
            FROM u2
        )
        SELECT *, {_url_surt(duck=True)} AS surt FROM (
        SELECT doc_id, host, path,
               len(params)::BIGINT AS n_params,
               scheme || '://' || host || path ||
               CASE WHEN len(params) > 0
                    THEN '?' || array_to_string(params, '&') ELSE '' END
               AS url_norm
        FROM u3)
    """


# ---------------------------------------------------------------------------
# C4-style page/line cleaning (r12): the canonical LLM corpus filter
# (Raffel et al. 2020, the public C4 recipe) — line-level retention +
# page-level rejection, all JVM HOFs
# ---------------------------------------------------------------------------

#: stand-in for C4's public blocklist (the real deployment swaps the
#: full "Dirty, Naughty…" list in — same predicate, longer array)
C4_BANNED = ("badword", "verybadword")

#: a line is RETAINED iff it ends in terminal punctuation, carries at
#: least MIN_WORDS words, and doesn't mention javascript (the classic
#: boilerplate tell); a PAGE is kept iff ≥ MIN_SENTENCES sentences
#: survive and it contains no brace, no "lorem ipsum", no banned word
C4_MIN_WORDS = 5
C4_MIN_SENTENCES = 3


def _c4_exprs(*, duck: bool, banned: tuple[str, ...]) -> dict[str, str]:
    """The engine-specific expression set behind :func:`c4_page_filter`
    and its DuckDB twin — one source of truth for both, so the gate leg
    runs the REAL operator on both engines (url-leg style parity)."""
    ws = r"\s+" if duck else r"\\s+"
    term = r'[.!?"]\s*$' if duck else r'[.!?"]\\s*$'
    if duck:
        split_ws = f"string_split_regex(trim(l), '{ws}')"
        line_ok = (
            f"l -> regexp_matches(trim(l), '{term}') "
            f"AND len({split_ws}) >= {C4_MIN_WORDS} "
            f"AND NOT contains(lower(l), 'javascript')"
        )
        kept = f"list_filter(string_split(text, chr(10)), {line_ok})"
        clean = f"coalesce(array_to_string({kept}, chr(10)), '')"
        n_kept = f"len({kept})::BIGINT"
        n_sent = "len(regexp_extract_all(text_clean, '[.!?]'))::BIGINT"
    else:
        split_ws = f"split(trim(l), '{ws}')"
        line_ok = (
            f"l -> trim(l) rlike '{term}' "
            f"AND size({split_ws}) >= {C4_MIN_WORDS} "
            f"AND NOT contains(lower(l), 'javascript')"
        )
        kept = f"filter(split(text, '\\n'), {line_ok})"
        clean = f"array_join({kept}, '\\n')"
        n_kept = f"cast(size({kept}) as long)"
        n_sent = "cast(size(regexp_extract_all(text_clean, '[.!?]', 0)) as long)"
    bad = " OR ".join(
        f"contains(lower(text), '{b}')" for b in banned
    )
    page_ok = (
        f"n_sentences >= {C4_MIN_SENTENCES} AND NOT contains(text, '{{')"
        " AND NOT contains(lower(text), 'lorem ipsum')"
    )
    if bad:
        page_ok += f" AND NOT ({bad})"
    return {
        "clean": clean,
        "n_kept": n_kept,
        "n_sent": n_sent,
        "page_ok": page_ok,
    }


def c4_page_filter(
    docs: DataFrame, banned: tuple[str, ...] = C4_BANNED
) -> DataFrame:
    """(doc_id, n_kept, n_sentences, page_kept, text_clean) — the C4
    cleaning recipe: retain lines ending in terminal punctuation with
    ≥ 5 words and no 'javascript'; then keep the page iff ≥ 3 sentences
    survive and the ORIGINAL text has no ``{``, no 'lorem ipsum', and
    no blocklist word. Pure JVM (split / filter / regexp HOFs) —
    map-only, whole-stage codegen; at 100 TB this is a projection, the
    cheapest possible corpus pass. The 3-sentence-span dedup C4 runs
    AFTER this filter is the dedup family's job
    (``dedup.py``/``corpus.py``), not re-implemented here."""
    e = _c4_exprs(duck=False, banned=banned)
    s1 = docs.select(
        "doc_id",
        "text",
        F.expr(e["clean"]).alias("text_clean"),
        F.expr(e["n_kept"]).alias("n_kept"),
    )
    s2 = s1.withColumn("n_sentences", F.expr(e["n_sent"]))
    return s2.select(
        "doc_id",
        "n_kept",
        "n_sentences",
        F.expr(e["page_ok"]).alias("page_kept"),
        "text_clean",
    )


def c4_page_filter_sql(
    source_sql: str, banned: tuple[str, ...] = C4_BANNED
) -> str:
    """DuckDB twin of :func:`c4_page_filter` over ``source_sql`` (a
    subquery yielding (doc_id, text)) — generated from the same
    expression set, engine-exact."""
    e = _c4_exprs(duck=True, banned=banned)
    return f"""
        WITH c1 AS (
            SELECT doc_id, text,
                   {e["clean"]} AS text_clean,
                   {e["n_kept"]} AS n_kept
            FROM ({source_sql})
        ),
        c2 AS (
            SELECT *, {e["n_sent"]} AS n_sentences FROM c1
        )
        SELECT doc_id, n_kept, n_sentences,
               ({e["page_ok"]}) AS page_kept,
               text_clean
        FROM c2
    """


# ---------------------------------------------------------------------------
# Gopher / MassiveText document-quality rules (r13)
# ---------------------------------------------------------------------------

#: the published MassiveText repetition/quality thresholds (Gopher,
#: Rae et al. 2021, Table A1). Every threshold is a keyword argument of
#: :func:`gopher_quality` so a pipeline (or the gate fixture, whose
#: constructed pages are far smaller than real documents) can tighten
#: or loosen them; these defaults are the published filter.
GOPHER_DEFAULTS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_frac": 0.9,
    "max_ellipsis_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "max_dup_line_frac": 0.3,
    "max_dup_para_frac": 0.3,
    "max_dup_line_char_frac": 0.2,
}

#: line-start bullets per the MassiveText rules (no backslashes, so the
#: one literal survives both engines' string-escape rules; the ellipsis
#: regex needs backslashes and is spelled per-engine in _gopher_exprs)
_BULLET_RE = "^[-*•‣▪]"


def _gopher_exprs(*, duck: bool) -> dict[str, str]:
    """Engine-specific expression set behind :func:`gopher_quality` and
    its DuckDB twin — one source of truth, c4/url-leg style parity.

    Stage-1 names bound: ``words`` (non-empty whitespace tokens),
    ``lines`` (trimmed non-empty lines), ``paras`` (trimmed non-empty
    blank-line-separated paragraphs). Stage-2 expressions address those
    arrays only. All fractions guard their zero denominators to 0.0 and
    divide as DOUBLE on both engines (identical IEEE ops ⇒ identical
    bits); the caller rounds with duck_round/round(…,4)."""
    ell = r"(\.\.\.|…)$" if duck else r"(\\.\\.\\.|…)$"
    if duck:
        words = r"list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w <> '')"
        lines = (
            "list_filter(list_transform(string_split(text, chr(10)),"
            " l -> trim(l)), l -> l <> '')"
        )
        paras = (
            r"list_filter(list_transform(regexp_split_to_array(text, '\n\s*\n'),"
            " p -> trim(p)), p -> p <> '')"
        )
        n_symbols = (
            "len(regexp_extract_all(text, '#'))"
            r" + len(regexp_extract_all(text, '\.\.\.|…'))"
        )
        n_bullet = f"len(list_filter(lines, l -> regexp_matches(l, '{_BULLET_RE}')))"
        n_ellipsis = f"len(list_filter(lines, l -> regexp_matches(l, '{ell}')))"
        n_alpha_words = (
            "len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))"
        )
        word_chars = "coalesce(list_sum(list_transform(words, w -> length(w))), 0)"
        n_distinct_lines = "len(list_distinct(lines))"
        n_distinct_paras = "len(list_distinct(paras))"
        dup_line_chars = (
            "coalesce(list_sum(list_transform(lines, x -> CASE WHEN"
            " len(list_filter(lines, y -> y = x)) > 1 THEN length(x)"
            " ELSE 0 END)), 0)"
        )
        line_chars = "coalesce(list_sum(list_transform(lines, l -> length(l))), 0)"
        n = "len"
    else:
        words = r"filter(split(trim(text), '\\s+'), w -> w <> '')"
        lines = "filter(transform(split(text, '\\n'), l -> trim(l)), l -> l <> '')"
        paras = (
            r"filter(transform(split(text, '\\n\\s*\\n'), p -> trim(p)),"
            " p -> p <> '')"
        )
        n_symbols = (
            "size(regexp_extract_all(text, '#', 0))"
            r" + size(regexp_extract_all(text, '\\.\\.\\.|…', 0))"
        )
        n_bullet = f"size(filter(lines, l -> l rlike '{_BULLET_RE}'))"
        n_ellipsis = f"size(filter(lines, l -> l rlike '{ell}'))"
        n_alpha_words = "size(filter(words, w -> w rlike '[A-Za-z]'))"
        word_chars = "aggregate(words, 0L, (a, w) -> a + length(w))"
        n_distinct_lines = "size(array_distinct(lines))"
        n_distinct_paras = "size(array_distinct(paras))"
        dup_line_chars = (
            "aggregate(lines, 0L, (a, x) -> a + CASE WHEN"
            " size(filter(lines, y -> y = x)) > 1 THEN length(x)"
            " ELSE 0 END)"
        )
        line_chars = "aggregate(lines, 0L, (a, l) -> a + length(l))"
        n = "size"

    def frac(num: str, den: str) -> str:
        return (
            f"CASE WHEN {den} = 0 THEN 0.0e0"
            f" ELSE CAST({num} AS DOUBLE) / {den} END"
        )

    return {
        "words": words,
        "lines": lines,
        "paras": paras,
        "n_words": f"CAST({n}(words) AS BIGINT)",
        "mean_word_len": frac(word_chars, f"{n}(words)"),
        "symbol_ratio": frac(n_symbols, f"{n}(words)"),
        "bullet_frac": frac(n_bullet, f"{n}(lines)"),
        "ellipsis_frac": frac(n_ellipsis, f"{n}(lines)"),
        "alpha_word_frac": frac(n_alpha_words, f"{n}(words)"),
        "dup_line_frac": frac(f"{n}(lines) - {n_distinct_lines}", f"{n}(lines)"),
        "dup_para_frac": frac(f"{n}(paras) - {n_distinct_paras}", f"{n}(paras)"),
        "dup_line_char_frac": frac(dup_line_chars, line_chars),
    }


_GOPHER_METRICS = (
    "mean_word_len",
    "symbol_ratio",
    "bullet_frac",
    "ellipsis_frac",
    "alpha_word_frac",
    "dup_line_frac",
    "dup_para_frac",
    "dup_line_char_frac",
)


def _gopher_keep(t: dict[str, float]) -> str:
    """The keep predicate over the ROUNDED metric columns — identical
    doubles on both engines compare identically against the literal
    thresholds, so the boolean can never split the engines."""
    return (
        f"n_words >= {t['min_words']} AND n_words <= {t['max_words']}"
        f" AND mean_word_len >= {t['min_mean_word_len']}"
        f" AND mean_word_len <= {t['max_mean_word_len']}"
        f" AND symbol_ratio <= {t['max_symbol_word_ratio']}"
        f" AND bullet_frac <= {t['max_bullet_frac']}"
        f" AND ellipsis_frac <= {t['max_ellipsis_frac']}"
        f" AND alpha_word_frac >= {t['min_alpha_word_frac']}"
        f" AND dup_line_frac <= {t['max_dup_line_frac']}"
        f" AND dup_para_frac <= {t['max_dup_para_frac']}"
        f" AND dup_line_char_frac <= {t['max_dup_line_char_frac']}"
    )


def gopher_quality(
    docs: DataFrame, with_text: bool = False, **thresholds: float
) -> DataFrame:
    """(doc_id, n_words, 8 repetition/quality fractions, keep) — the
    Gopher/MassiveText document-quality rules (Rae et al. 2021, Table
    A1): word-count and mean-word-length bounds, symbol-to-word ratio
    ('#'/ellipsis), bullet-start and ellipsis-end line fractions,
    alphabetic-word fraction, duplicate-line / duplicate-paragraph
    fractions, and the fraction of characters sitting inside duplicated
    lines. ``keep`` is the conjunction over the published thresholds
    (override any via kwargs).

    Scale shape: map-only — the line/paragraph/word arrays bind once
    (stage 1) and every metric is array arithmetic over those bindings
    (stage 2); no shuffle, no Python. The duplicate-char scan is
    O(lines²) per document but doc-local, so it parallelizes perfectly
    and never skews a partition. At 100 TB this is one projection over
    the corpus, fused by whole-stage codegen with whatever filter
    consumes ``keep``. ``with_text=True`` carries the text column
    through (still map-only — the streaming quality gate filters on
    ``keep`` and republishes the text without any join)."""
    t = {**GOPHER_DEFAULTS, **thresholds}
    e = _gopher_exprs(duck=False)
    s1 = docs.select(
        "doc_id",
        "text",
        F.expr(e["words"]).alias("words"),
        F.expr(e["lines"]).alias("lines"),
        F.expr(e["paras"]).alias("paras"),
    )
    s2 = s1.select(
        "doc_id",
        *(["text"] if with_text else []),
        F.expr(e["n_words"]).alias("n_words"),
        *[duck_round(F.expr(e[m]), 4).alias(m) for m in _GOPHER_METRICS],
    )
    return s2.withColumn("keep", F.expr(_gopher_keep(t)))


def gopher_quality_sql(source_sql: str = "SELECT * FROM documents",
                       **thresholds: float) -> str:
    """DuckDB twin of :func:`gopher_quality` over ``source_sql`` (a
    subquery yielding (doc_id, text)) — generated from the same
    expression set, engine-exact."""
    t = {**GOPHER_DEFAULTS, **thresholds}
    e = _gopher_exprs(duck=True)
    metrics = ",\n                   ".join(
        f"round({e[m]}, 4) AS {m}" for m in _GOPHER_METRICS
    )
    return f"""
        WITH g1 AS (
            SELECT doc_id, text,
                   {e["words"]} AS words,
                   {e["lines"]} AS lines,
                   {e["paras"]} AS paras
            FROM ({source_sql})
        ),
        g2 AS (
            SELECT doc_id,
                   {e["n_words"]} AS n_words,
                   {metrics}
            FROM g1
        )
        SELECT *, ({_gopher_keep(t)}) AS keep FROM g2
    """


# ---------------------------------------------------------------------------
# Unicode normalization / cleanup (r13)
# ---------------------------------------------------------------------------

#: zero-width characters scrubbed before tokenization (ZWSP/ZWNJ/ZWJ/
#: BOM-as-ZWNBSP) and the C0/C1 controls kept (tab, newline)
_ZW_CHARS = "​‌‍﻿"
_PUNCT_FOLDS = [
    ("“", '"'), ("”", '"'),
    ("‘", "'"), ("’", "'"),
    ("–", "-"), ("—", "-"),
    (" ", " "),
]


def unicode_clean(docs: DataFrame) -> DataFrame:
    """(doc_id, n_zero_width, n_controls, text_norm) — the Unicode
    hygiene pass every tokenizer-bound corpus runs (r13): count and
    strip zero-width characters (ZWSP/ZWNJ/ZWJ/ZWNBSP — invisible
    tokens that split words and poison dedup keys) and C0/C1 control
    characters (tab, LF and CR kept — r14: CR was previously stripped,
    which silently ate the \\r of every CRLF in Windows-newline
    corpora and counted it as a control), fold the typographic
    punctuation
    web text is full of (curly quotes, en/em dashes, NBSP) to ASCII,
    then NFC-normalize so combining sequences collapse to their
    precomposed forms (one 'é', not 'e'+U+0301 — the difference that
    silently breaks exact-dedup and vocabulary counts).

    NFC needs a real Unicode database, so this is an Arrow-batched
    kernel (stdlib ``unicodedata``) rather than JVM expressions — the
    same map-only per-batch posture as the HTML extractor. The DuckDB
    twin uses the engine's ``nfc_normalize`` (utf8proc); both
    implement the same Unicode standard and the parity leg pins them
    against each other."""
    import re as _re
    from typing import Iterator as _It

    zw_re = _re.compile(f"[{_ZW_CHARS}]")
    ctl_re = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x80-\x9f]")

    def clean_one(s: str) -> tuple[int, int, str]:
        import unicodedata as _ud

        n_zw = len(zw_re.findall(s))
        n_ctl = len(ctl_re.findall(s))
        s = zw_re.sub("", s)
        s = ctl_re.sub("", s)
        for a, b in _PUNCT_FOLDS:
            s = s.replace(a, b)
        return n_zw, n_ctl, _ud.normalize("NFC", s)

    def gen(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [clean_one(x or "") for x in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_zero_width": [r[0] for r in rows],
                    "n_controls": [r[1] for r in rows],
                    "text_norm": [r[2] for r in rows],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen,
        schema="doc_id long, n_zero_width long, n_controls long, "
        "text_norm string",
    )


def unicode_clean_sql(source_sql: str = "SELECT * FROM documents") -> str:
    """DuckDB twin of :func:`unicode_clean` — the same strip/fold
    order ending in the engine's ``nfc_normalize``."""
    zw_class = _ZW_CHARS  # literal chars: RE2 has no \\uXXXX escapes
    ctl_class = (
        "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f' || chr(128) || '-' "
        "|| chr(159) || ']'"
    )
    expr = "s"
    for a, b in _PUNCT_FOLDS:
        bq = b.replace("'", "''")
        expr = f"replace({expr}, chr({ord(a)}), '{bq}')"
    return f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[{zw_class}]'))::BIGINT
                   AS n_zero_width,
               len(regexp_extract_all(text, {ctl_class}))::BIGINT
                   AS n_controls,
               nfc_normalize({expr}) AS text_norm
        FROM (
            SELECT doc_id, text,
                   regexp_replace(regexp_replace(text, '[{zw_class}]',
                       '', 'g'), {ctl_class}, '', 'g') AS s
            FROM ({source_sql})
        )
    """


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_ips, text_scrubbed) — redact email addresses
    and IPv4 literals to ``<EMAIL>`` / ``<IP>`` placeholders, counting
    what was redacted. Emails scrub FIRST so an address's host part is
    never half-matched as an IP. Map-only; the counts come from the
    same single-bind staged projection as the scrubbed text."""
    staged = docs.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(text, '{EMAIL_RE}', 0))")
        .cast("long")
        .alias("n_emails"),
        F.expr(f"regexp_replace(text, '{EMAIL_RE}', '<EMAIL>')").alias("de_mailed"),
    )
    return staged.select(
        "doc_id",
        "n_emails",
        F.expr(f"size(regexp_extract_all(de_mailed, '{IPV4_RE}', 0))")
        .cast("long")
        .alias("n_ips"),
        F.expr(f"regexp_replace(de_mailed, '{IPV4_RE}', '<IP>')").alias(
            "text_scrubbed"
        ),
    )


def pii_scrub_sql() -> str:
    return f"""
        WITH s AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
                   regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS de_mailed
            FROM documents
        )
        SELECT doc_id, n_emails,
               len(regexp_extract_all(de_mailed, '{IPV4_RE}'))::BIGINT AS n_ips,
               regexp_replace(de_mailed, '{IPV4_RE}', '<IP>', 'g') AS text_scrubbed
        FROM s
    """


# ---------------------------------------------------------------------------
# one-pass feature extraction + corpus vocabulary
# ---------------------------------------------------------------------------


def features(docs: DataFrame) -> DataFrame:
    """Every per-document text feature in ONE scan: token counts
    (whitespace + BPE-ish), quality-score components, language ID,
    content fingerprint, and the rolling k-gram fingerprint pair.

    This is the shape a 100 TB pipeline actually runs — the corpus is
    scanned once and all map-only features come out of the same pass —
    where the single-feature operators above each re-read the text
    column. Same staged-projection discipline: the token split and the
    normalization each bind once (stage 1), every regex/hash binds once
    (stage 2), and stage 3 is cheap arithmetic + CASE over those
    columns. Still map-only: no shuffle at any stage. The k-gram
    fingerprint pair runs in the vectorized Arrow kernel
    (:func:`_kgram_fp_kernel`) — the SQL higher-order-function form is
    interpreted per window and was the single biggest cost of this scan
    (measured 1.2 s of 2.5 s at sf0.1)."""
    langs = sorted(LANG_LEXICONS)
    s1 = docs.select(
        "doc_id",
        "lang",
        "text",
        F.expr(TOKENS_SPARK).alias("toks"),
        F.expr(NORM_SPARK).alias("norm"),
    )
    s2 = s1.select(
        "doc_id",
        "lang",
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{BPE_PATTERN}', 0))")
        .cast("long")
        .alias("n_bpe_tokens"),
        F.expr("length(regexp_replace(text, '[^a-zA-Z]', ''))").alias("alpha_len"),
        F.expr("length(text)").alias("text_len"),
        F.expr("md5(norm)").alias("fp"),
        # the two Arrow kernels evaluate together in ONE Python worker
        # pass (a single ArrowEvalPython node — both are the same eval
        # type at the same stage)
        kgram_fp_udf()(F.expr(_kgram_prep("norm", duck=False))).alias("kfp"),
        token_stats_udf()(F.col("toks")).alias("tst"),
    )
    # flatten the kernel structs so the shared quality/CASE fragments
    # keep addressing plain column names
    s2 = s2.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_bpe_tokens",
        "alpha_len",
        "text_len",
        "fp",
        "kfp",
        F.col("tst.stop_hits").alias("stop_hits"),
        *[F.col(f"tst.sc_{l}").alias(f"sc_{l}") for l in langs],
        F.col("tst.n_distinct").alias("n_distinct"),
        F.col("tst.top_cnt").alias("top_cnt"),
        F.col("tst.n_g2").alias("n_g2"),
        F.col("tst.n_g2_distinct").alias("n_g2_distinct"),
        F.col("tst.tok_chars").alias("tok_chars"),
    )
    case = _winner_case({l: f"sc_{l}" for l in langs})
    q = _quality_fragments()
    return s2.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_bpe_tokens",
        duck_round(F.expr(q["stop_ratio"]), 4).alias("stop_ratio"),
        duck_round(F.expr(q["alpha_ratio"]), 4).alias("alpha_ratio"),
        duck_round(F.expr(q["quality"]), 4).alias("quality"),
        F.expr(case).alias("pred_lang"),
        "fp",
        F.expr("CAST(conv(substring(fp, 1, 15), 16, 10) AS BIGINT)").alias("fp_long"),
        F.col("kfp.n_kgrams").alias("n_kgrams"),
        F.col("kfp.min_fp").alias("min_fp"),
        duck_round(F.expr("CAST(n_distinct AS DOUBLE) / n_tokens"), 4).alias(
            "distinct_tok_ratio"
        ),
        duck_round(F.expr("CAST(top_cnt AS DOUBLE) / n_tokens"), 4).alias(
            "top_tok_frac"
        ),
        duck_round(
            F.expr(
                "CASE WHEN n_g2 = 0 THEN 0.0e0 "
                "ELSE 1.0e0 - CAST(n_g2_distinct AS DOUBLE) / n_g2 END"
            ),
            4,
        ).alias("dup_2gram_frac"),
        duck_round(F.expr("CAST(tok_chars AS DOUBLE) / n_tokens"), 4).alias(
            "mean_tok_len"
        ),
    )


def features_sql() -> str:
    langs = sorted(LANG_LEXICONS)
    sc_cols = ",\n                   ".join(
        f"len(list_filter(toks, t -> t IN {_in_list(LANG_LEXICONS[l])})) AS sc_{l}"
        for l in langs
    )
    case = _winner_case({l: f"sc_{l}" for l in langs})
    q = _quality_fragments()
    return f"""
        WITH s1 AS (
            SELECT doc_id, lang, text,
                   {TOKENS_DUCK} AS toks, {NORM_DUCK} AS norm
            FROM documents
        ),
        s2 AS (
            SELECT doc_id, lang,
                   len(toks)::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '{BPE_PATTERN}'))::BIGINT AS n_bpe_tokens,
                   len(list_filter(toks, t -> t IN {_in_list(QUALITY_STOPWORDS)})) AS stop_hits,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_len,
                   length(text) AS text_len,
                   {sc_cols},
                   md5(norm) AS fp,
                   {_kgram_hashes_duck("norm")} AS hashes,
                   len(list_distinct(toks))::BIGINT AS n_distinct,
                   list_max(list_transform(list_distinct(toks),
                       x -> len(list_filter(toks, y -> y = x))))::BIGINT AS top_cnt,
                   list_transform(generate_series(1, len(toks) - 1),
                       i -> concat_ws(' ', toks[i], toks[i+1])) AS g2,
                   list_sum(list_transform(toks, t -> length(t)))::BIGINT AS tok_chars
            FROM s1
        )
        SELECT doc_id, lang, n_tokens, n_bpe_tokens,
               round({q["stop_ratio"]}, 4) AS stop_ratio,
               round({q["alpha_ratio"]}, 4) AS alpha_ratio,
               round({q["quality"]}, 4) AS quality,
               {case} AS pred_lang,
               fp,
               ('0x' || substr(fp, 1, 15))::BIGINT AS fp_long,
               len(list_distinct(hashes))::BIGINT AS n_kgrams,
               list_min(hashes) AS min_fp,
               round(CAST(n_distinct AS DOUBLE) / n_tokens, 4) AS distinct_tok_ratio,
               round(CAST(top_cnt AS DOUBLE) / n_tokens, 4) AS top_tok_frac,
               round(CASE WHEN len(g2) = 0 THEN 0.0e0
                     ELSE 1.0e0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) END,
                     4) AS dup_2gram_frac,
               round(CAST(tok_chars AS DOUBLE) / n_tokens, 4) AS mean_tok_len
        FROM s2
    """


def token_counts(docs: DataFrame) -> DataFrame:
    """(token, freq) — corpus-wide token frequencies: explode →
    hash-aggregate with map-side partials (the only shuffle, keyed on
    the token). The shared upstream of :func:`vocab_topn` and the
    weighted count-min build — materialize it ONCE when a pipeline
    needs both."""
    return (
        docs.select(F.explode(F.expr(TOKENS_SPARK)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )


def vocab_topn(
    docs: DataFrame, n: int = 100, counts: DataFrame | None = None
) -> DataFrame:
    """(token, freq, rnk) — the corpus-wide top-``n`` token vocabulary,
    ranked by frequency with an alphabetical tiebreak. Pass ``counts``
    (a materialized :func:`token_counts`) to skip the corpus scan.

    Scale shape: explode → hash-aggregate with map-side partials (the
    only shuffle, keyed on the token), then ``orderBy().limit(n)`` which
    Spark executes as TakeOrderedAndProject — each task keeps a local
    top-``n`` heap and the driver merges heaps, so the full vocabulary
    is never sorted or collected. The final rank over the ``n``
    surviving rows is a broadcast self-join count (rnk = 1 + rows that
    sort strictly before) — ≤ n² comparisons of an n-row table, no
    global window (whose empty partition spec would both warn and pin a
    single task)."""
    if counts is None:
        counts = token_counts(docs)
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(n)
    before = F.broadcast(
        top.select(F.col("token").alias("b_token"), F.col("freq").alias("b_freq"))
    )
    strictly_before = (F.col("b_freq") > F.col("freq")) | (
        (F.col("b_freq") == F.col("freq")) & (F.col("b_token") < F.col("token"))
    )
    return (
        top.join(before, strictly_before, "left")
        .groupBy("token", "freq")
        .agg((F.count("b_token") + 1).cast("long").alias("rnk"))
    )


def vocab_topn_sql(n: int = 100) -> str:
    return f"""
        WITH w AS (
            SELECT unnest({TOKENS_DUCK}) AS token FROM documents
        ),
        c AS (
            SELECT token, count(*)::BIGINT AS freq FROM w
            WHERE token <> '' GROUP BY token
        )
        SELECT token, freq,
               (row_number() OVER (ORDER BY freq DESC, token))::BIGINT AS rnk
        FROM c
        ORDER BY freq DESC, token LIMIT {n}
    """


def tokenize_with_vocab(docs: DataFrame, vocab_n: int = 100) -> DataFrame:
    """(doc_id, n_tokens, n_oov, ids_fp, ids_sum) — map every document to
    its token-id sequence under the corpus top-``vocab_n`` vocabulary
    (id = [[vocab_topn]] rank, out-of-vocabulary → 0): the step between
    vocabulary building and sequence packing in a pretraining pipeline.
    The id sequence itself travels as ``ids_fp`` (md5 of the
    comma-joined ids) plus the ``ids_sum`` checksum, so the wire schema
    stays scalar while still pinning the exact per-position ids.

    Scale design: the vocabulary is **bounded by construction**
    (``vocab_n`` rows — the one thing a tokenizer must hold in memory),
    so it is collected and inlined as a literal map, exactly like
    broadcasting a tokenizer to every executor: tokenization itself is
    then map-only over the corpus — one codegen'd ``transform`` per
    row, no explode, no shuffle, no per-token join. The alternative
    (posexplode → vocab join → re-aggregate by doc_id) shuffles every
    token of a 100 TB corpus to rebuild rows that already existed; only
    a vocabulary too big to broadcast (100M+ entries) would justify it."""
    rows = vocab_topn(docs, vocab_n).select("token", "rnk").collect()
    mapping = F.create_map(
        *[F.lit(x) for r in rows for x in (r["token"], r["rnk"])]
    )
    toks = docs.select("doc_id", F.expr(TOKENS_SPARK).alias("toks"))
    ids = toks.select(
        "doc_id",
        F.transform(
            F.col("toks"),
            lambda t: F.coalesce(F.element_at(mapping, t), F.lit(0).cast("long")),
        ).alias("ids"),
    )
    return ids.select(
        "doc_id",
        F.expr("size(ids)").cast("long").alias("n_tokens"),
        F.expr("size(filter(ids, i -> i = 0))").cast("long").alias("n_oov"),
        F.expr(
            "md5(array_join(transform(ids, i -> CAST(i AS STRING)), ','))"
        ).alias("ids_fp"),
        F.expr("aggregate(ids, 0L, (a, x) -> a + x)").alias("ids_sum"),
    )


def tokenize_with_vocab_sql(vocab_n: int = 100) -> str:
    """DuckDB twin: the ordered vocab token list makes ``list_position``
    return exactly the [[vocab_topn]] rank (1-based), so the id math is
    shared with the Spark side by construction."""
    return f"""
        WITH v AS ({vocab_topn_sql(vocab_n)}),
        vl AS (SELECT list(token ORDER BY rnk) AS vlist FROM v),
        t AS (SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents),
        ids AS (
            SELECT doc_id,
                   list_transform(toks, tk ->
                       coalesce(list_position(vlist, tk), 0)::BIGINT) AS ids
            FROM t, vl
        )
        SELECT doc_id,
               len(ids)::BIGINT AS n_tokens,
               len(list_filter(ids, i -> i = 0))::BIGINT AS n_oov,
               md5(array_to_string(list_transform(ids, i -> i::VARCHAR), ',')) AS ids_fp,
               list_sum(ids)::BIGINT AS ids_sum
        FROM ids
    """


# ---------------------------------------------------------------------------
# BM25 relevance ranking
# ---------------------------------------------------------------------------

#: BM25 constants (the Robertson/Walker defaults) and the fixed-point
#: scale for cross-engine-exact scores, following the LM scorer's
#: micro-unit discipline (operators/lm.py): per-(doc, term) partial
#: scores quantize to BIGINT micro-units, so the per-doc SUM is exact
#: integer arithmetic — order-free and engine-identical; the one libm
#: call (ln in the idf) sits behind the same guard-band argument as the
#: LM entry (asserted in tests/test_text.py).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_FP_SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    counts: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score_fp, rank) — top-``k`` documents by BM25 relevance
    to the query ``terms`` (rank ties broken by doc_id): the
    query-driven curation primitive — "give me the corpus slice most
    relevant to this topic" — and the classic lexical-retrieval baseline
    next to the embedding top-k (`sim_cosine_topk`).

    Scale shape: ONE corpus scan projects (doc_id, len); the term-level
    stream is the explode FILTERED to the query terms before its
    aggregation, so every shuffled row mentions a query term —
    |docs| x |terms| worst case, not corpus tokens. Corpus statistics
    (N, avg length, per-term df) are scalar/|terms|-sized aggregates
    broadcast back (crossJoin of one-row frames — never a driver
    collect of data rows), and the final top-k is
    TakeOrderedAndProject. idf uses the BM25+ floor form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — nonnegative even for
    terms in over half the corpus.

    Pass ``counts`` (a materialized :func:`token_counts` **of this same
    ``docs`` frame** — ADVICE r8: a counts built from a different corpus
    silently skews ``avg_len`` and with it every score; the schema is
    asserted below, but the same-frame contract is the caller's) to
    derive the corpus statistics from it instead of a second tokenize
    scan: ``avg_len = sum(freq) / n_docs`` — the total is an exact
    integer on both engines (< 2^53), so the division is bit-identical
    to summing per-doc lengths in any order, and ``n_docs`` comes from a
    column-pruned count-only scan (late r8: this plus caching the
    k-row top — which the rank join references twice — removed two of
    the leg's three corpus tokenize passes)."""
    if counts is not None and not {"token", "freq"} <= set(counts.columns):
        raise ValueError(
            "counts must be a token_counts frame (token, freq) built "
            f"from the same docs frame; got columns {counts.columns}"
        )

    def _build_top() -> DataFrame:
        toks = docs.select(
            "doc_id", F.expr(TOKENS_SPARK).alias("toks")
        ).select(
            "doc_id",
            F.expr("size(filter(toks, t -> t <> ''))").cast("double").alias("len"),
            F.col("toks"),
        )
        cnt = token_counts(docs) if counts is None else counts
        stats = (
            docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
            .crossJoin(cnt.agg(F.sum("freq").cast("double").alias("tot")))
            .select("n_docs", (F.col("tot") / F.col("n_docs")).alias("avg_len"))
        )
        term_col = F.explode(
            F.filter(F.col("toks"), lambda t: t.isin(*terms))
        ).alias("term")
        tf = (
            toks.select("doc_id", "len", term_col)
            .groupBy("doc_id", "len", "term")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        )
        df_t = tf.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("df")
        )
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        tf_part = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("len") / F.col("avg_len"))
        )
        scored = (
            tf.join(F.broadcast(df_t), "term")
            .crossJoin(F.broadcast(stats))
            .select(
                "doc_id",
                # parenthesization matches the SQL twin's SCALE * (idf * tf)
                # exactly — FP multiplication is non-associative, and the
                # bit-exact claim needs identical expression TREES, not just
                # identical operands
                duck_round(F.lit(BM25_FP_SCALE) * (idf * tf_part), 0)
                .cast("long")
                .alias("part_fp"),
            )
            .groupBy("doc_id")
            .agg(F.sum("part_fp").alias("score_fp"))
        )
        return scored.orderBy(F.desc("score_fp"), F.asc("doc_id")).limit(k)

    # rank by counting strictly-before rows WITHIN the top-k (the
    # vocab_topn pattern): any row before a top-k row in the total
    # order is itself in the top-k, so top-vs-top comparisons suffice —
    # and the broadcast stays bounded at k rows (broadcasting the full
    # scored table would be O(matching docs), unbounded on a common
    # query term). The k-row top is persist-tracked: the rank join
    # references it on BOTH sides, and without a cache each reference
    # re-executes the whole tf chain (a full corpus tokenize).
    # r17: LAZY — constructing the scored chain and semantic-hashing it
    # cost ~0.8 s of driver work per invocation (measured warm); the
    # builder now runs only on a cache miss. plan_key covers the full
    # input identity under the documented same-frame ``counts``
    # contract: the docs hash, the query terms, k, and whether a
    # shared counts frame supplied the corpus statistics (both stats
    # trees are exact-identical by construction — see the docstring).
    from timeseries_db_spark.operators.dedup import _persist_tracked_lazy

    top = _persist_tracked_lazy(
        "bm25_top",
        f"{docs.semanticHash()}:{','.join(terms)}:{k}:{int(counts is not None)}",
        _build_top,
    )
    w_before = top.select(
        F.col("doc_id").alias("b_id"), F.col("score_fp").alias("b_fp")
    )
    strictly_before = (F.col("b_fp") > F.col("score_fp")) | (
        (F.col("b_fp") == F.col("score_fp")) & (F.col("b_id") < F.col("doc_id"))
    )
    return (
        top.join(F.broadcast(w_before), strictly_before, "left")
        .groupBy("doc_id", "score_fp")
        .agg((F.count("b_id") + 1).cast("long").alias("rank"))
    )


def bm25_topk_sql(terms: tuple[str, ...], k: int = 20) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical expression trees
    (same literal constants, same operation order), so every IEEE op
    matches bitwise and the micro-unit partials agree exactly."""
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   len(list_filter({TOKENS_DUCK}, t -> t <> ''))::DOUBLE AS len,
                   {TOKENS_DUCK} AS toks
            FROM documents
        ),
        stats AS (
            -- sum(len) is integer-valued and < 2^53, so the total (and
            -- the division) is exact on both engines — matches the
            -- Spark side's shared-token_counts sum(freq)/n_docs tree
            SELECT count(*)::DOUBLE AS n_docs,
                   (SELECT sum(len) FROM toks) / count(*)::DOUBLE AS avg_len
            FROM toks
        ),
        tf AS (
            SELECT doc_id, len, term, count(*)::DOUBLE AS tf
            FROM (SELECT doc_id, len, unnest(toks) AS term FROM toks)
            WHERE term IN ({term_list})
            GROUP BY doc_id, len, term
        ),
        df_t AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scored AS (
            SELECT doc_id,
                   sum(round({BM25_FP_SCALE} * (
                       ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                       * ((tf * {BM25_K1 + 1.0}) / (tf + {BM25_K1}
                          * ({1.0 - BM25_B} + {BM25_B} * len / avg_len)))
                   ))::BIGINT)::BIGINT AS score_fp
            FROM tf JOIN df_t USING (term) CROSS JOIN stats
            GROUP BY doc_id
        )
        SELECT doc_id, score_fp,
               row_number() OVER (ORDER BY score_fp DESC, doc_id ASC) AS rank
        FROM scored
        ORDER BY score_fp DESC, doc_id ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# feature-hashing text vectorizer (hashing trick)
# ---------------------------------------------------------------------------

#: Hashed bag-of-words dimensionality. 64 keeps the whole vector in one
#: cache line of doubles and matches the embeddings fixture's width, so
#: hashed text vectors drop straight into the similarity/ANN stack.
TVEC_DIM = 64


def text_hash_vectors(docs: DataFrame, dim: int = TVEC_DIM) -> DataFrame:
    """(doc_id, vec) — the hashing trick (Weinberger et al. 2009):
    token → md5-long mod ``dim`` bucket, per-bucket term counts,
    L2-normalized into a dense ``array<double>``. Gives every document
    a REAL derived embedding with no external model — identical texts
    get identical vectors, near-dup texts high cosine — so the whole
    similarity stack (cosine top-k, SRP/IVF ANN, SemDeDup) runs
    end-to-end on raw text.

    Determinism: counts are integers, the L2 norm is
    ``sqrt`` of an exact integer sum, and each coordinate is one IEEE
    division — every digit engine-exact. Zero-token docs get the zero
    vector.

    Scale shape: one token explode → one (doc, bucket) hash aggregation
    → one per-doc aggregation building the dense map; map-side partials
    on both aggs; no joins, no shuffle beyond the two keyed aggs."""
    from timeseries_db_spark.functions.hashing import md5_long

    tok = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("tok")
    ).filter(F.col("tok") != "")
    bucketed = tok.select(
        "doc_id", (md5_long(F.col("tok")) % dim).alias("b")
    )
    counts = bucketed.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dense = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "cnt"))).alias("m")
    ).select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {dim - 1}),"
            " i -> CAST(coalesce(element_at(m, CAST(i AS BIGINT)), 0) AS DOUBLE))"
        ).alias("raw"),
    )
    norm = F.expr(
        "sqrt(aggregate(transform(raw, x -> x * x), CAST(0 AS DOUBLE),"
        " (a, v) -> a + v))"
    )
    with_vec = dense.select(
        "doc_id",
        F.when(norm == 0.0, F.col("raw"))
        .otherwise(F.expr(
            "transform(raw, x -> x / sqrt(aggregate("
            "transform(raw, y -> y * y), CAST(0 AS DOUBLE), (a, v) -> a + v)))"
        ))
        .alias("vec"),
    )
    # zero-token docs contribute no count rows — restore them with the
    # zero vector so every input doc has a row
    zeros = F.expr(f"transform(sequence(0, {dim - 1}), i -> CAST(0 AS DOUBLE))")
    return docs.select("doc_id").join(with_vec, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("vec"), zeros).alias("vec")
    )


def text_vec_summary(docs: DataFrame, dim: int = TVEC_DIM) -> DataFrame:
    """(vec_id, n_dims, scale, sum_q, max_err) — per-doc summary of the
    hashed vector, shaped to union with ``quantize_int8`` /
    ``rp_summary`` rows (the ``sim_quantize_int8`` entry's ``tvec``
    leg): ``scale`` = the raw count vector's L2 norm (6 dp), ``sum_q``
    = exact fixed-point (1e6) sum of the normalized coordinates
    (order-free: integer micro-units), ``max_err`` = occupied-bucket
    fraction (the hashing-collision diagnostic). ``scale`` is the UNIT
    vector's norm — 1.0 for any non-empty doc, 0.0 for empty ones —
    i.e. the normalization proof, not the raw magnitude."""
    vecs = text_hash_vectors(docs, dim)
    norm_expr = F.expr(
        "sqrt(aggregate(transform(vec, x -> x * x), CAST(0 AS DOUBLE),"
        " (a, v) -> a + v))"
    )
    return vecs.select(
        F.col("doc_id").alias("vec_id"),
        F.lit(dim).cast("long").alias("n_dims"),
        duck_round(norm_expr, 6).alias("scale"),
        F.expr(
            "aggregate(transform(vec, x -> CAST(floor(x * 1000000.0 + 0.5)"
            " AS BIGINT)), CAST(0 AS BIGINT), (a, v) -> a + v)"
        ).alias("sum_q"),
        duck_round(
            F.expr(
                "aggregate(transform(vec, x -> CASE WHEN x <> 0.0 THEN 1"
                " ELSE 0 END), 0, (a, v) -> a + v)"
            )
            / F.lit(float(dim)),
            6,
        ).alias("max_err"),
    )


def text_vec_summary_sql(dim: int = TVEC_DIM) -> str:
    """DuckDB twin — works on the (doc, bucket) count table directly:
    zero coordinates contribute 0 to every fold, so bucket-order sums
    equal the Spark side's coordinate-order folds exactly (integer
    micro-units; one IEEE division per coordinate)."""
    h = f"(('0x' || substr(md5(tok), 1, 15))::BIGINT) % {dim}"
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS tok FROM documents
        ),
        counts AS (
            SELECT doc_id, {h} AS b, count(*) AS cnt
            FROM tok WHERE tok <> '' GROUP BY 1, 2
        ),
        per AS (
            SELECT doc_id,
                   sqrt(sum((cnt * cnt)::DOUBLE)) AS norm,
                   count(*) AS n_occ
            FROM counts GROUP BY 1
        ),
        q AS (
            SELECT c.doc_id,
                   sum(floor((c.cnt / p.norm) * 1000000.0 + 0.5)::BIGINT)
                       AS sum_q
            FROM counts c JOIN per p ON c.doc_id = p.doc_id
            GROUP BY 1
        )
        SELECT d.doc_id AS vec_id,
               {dim}::BIGINT AS n_dims,
               COALESCE(round(CASE WHEN p.norm > 0 THEN 1.0 ELSE 0.0 END, 6),
                        0.0) AS scale,
               COALESCE(q.sum_q, 0)::BIGINT AS sum_q,
               COALESCE(round(p.n_occ / {float(dim)}, 6), 0.0) AS max_err
        FROM documents d
        LEFT JOIN per p ON d.doc_id = p.doc_id
        LEFT JOIN q ON d.doc_id = q.doc_id
    """


def _demojibake_once(s: str) -> str | None:
    """One repair pass: if the string survives a cp1252 (or latin-1)
    re-encode and decodes as valid UTF-8 INTO A DIFFERENT string, it
    was double-encoded — return the repaired text, else None. Plain
    ASCII round-trips unchanged (no fix), and genuine single-byte
    text ('café' as latin-1) fails the UTF-8 decode (no fix) — the
    same conservative rule ftfy's core applies."""
    for enc in ("cp1252", "latin-1"):
        try:
            b = s.encode(enc)
        except UnicodeEncodeError:
            continue
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if t != s:
            return t
    return None


def mojibake_fix(docs: DataFrame) -> DataFrame:
    """(doc_id, n_fixes, text_fixed) — repair UTF-8-as-cp1252 mojibake
    (r14): web text routinely arrives double-encoded ('café' shipped
    as 'cafÃ©', twice-encoded as 'cafÃƒÂ©'), and tokenizers treat the
    garbage as real vocabulary. Up to 3 repair passes, each applied
    only when the cp1252/latin-1 re-encode round-trips as VALID UTF-8
    into a different string — the conservative ftfy rule, so clean
    text (ASCII or real UTF-8 that doesn't round-trip) is never
    touched. Arrow-batched map-only kernel (codecs need the real
    Unicode tables)."""
    from typing import Iterator as _It

    def fix_one(s: str) -> tuple[int, str]:
        n = 0
        while n < 3:
            t = _demojibake_once(s)
            if t is None:
                break
            s = t
            n += 1
        return n, s

    def gen(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [fix_one(x or "") for x in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_fixes": [r[0] for r in rows],
                    "text_fixed": [r[1] for r in rows],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, n_fixes long, text_fixed string"
    )
