"""Byte-pair-encoding tokenizer: a DISTRIBUTED trainer plus two appliers.

The canonical tokenizer-training step of an LLM data pipeline (Sennrich
et al. 2016, the GPT-2 vocabulary recipe): start from characters,
repeatedly merge the most frequent adjacent symbol pair. The reference
engine has no tokenizer — this is north-star surface, built Spark-first:

* **Trainer** (:func:`bpe_train`): BPE statistics live on the DISTINCT
  word table (word -> corpus frequency), which is vocabulary-sized, not
  corpus-sized — the one distributed aggregation over the corpus happens
  once, and every merge iteration then runs on the word table: one
  adjacent-pair count (hash agg with map-side combine), one bounded
  ``TakeOrdered(1)`` to the driver (the argmax pair — a single row, the
  same bounded-collect discipline as the IVF centroid sample), one
  map-only merge transform. Lineage is ``localCheckpoint``-truncated
  every few rounds exactly like the connected-components loop
  (``graph.py``). At 100 TB the word table for web text is ~10-100M rows
  — comfortably distributed, never driver-materialized.

* **Greedy merge = literal string replace.** A word travels as its
  DOUBLE-SPACE-joined symbol string ``"  t  h  e  "``; merging pair
  (a, b) is ``replace(s, ' a  b ', ' ab ')``. Each match consumes one
  space of each flanking double boundary and the replacement restores
  them, so left-to-right non-overlapping ``replace`` — identical
  semantics in Spark and DuckDB (verified, including the self-pair
  ``aaaa -> [aa, aa]`` case) — implements exactly the greedy
  left-to-right single-merge pass of the BPE definition. No UDF, no
  fold, whole-stage codegen.

* **Appliers**: :func:`bpe_apply_expr` chains those replaces as JVM
  expressions for a FIXED merge list (the shipped-tokenizer shape; SQL
  twin :func:`bpe_segment_sql` makes it value-oracle-able — the
  ``corpus_tokenize`` gate entry carries it as the ``bpe`` leg), and
  :func:`bpe_apply_udf` is the Arrow-batched scale path for LEARNED
  vocabularies of thousands of merges, where one Python pass per
  distinct word beats a thousand chained codegen'd replaces.

Self-consistency is tested, not assumed: trainer final state ==
sequential apply of its merge list; expr apply == udf apply == a
pure-Python oracle (``tests/test_bpe.py``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.functions.hashing import md5_long, md5_long_sql
from timeseries_db_spark.operators.text import TOKENS_DUCK, TOKENS_SPARK

#: Fixed default merge table for the gate leg — common English bigram
#: merges in a hand-written, corpus-independent order (a shipped
#: tokenizer is exactly such a frozen list; training one is what
#: :func:`bpe_train` is for). Kept short so the chained-replace SQL twin
#: stays readable.
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
]


def _sym_string(word_col):
    """``'  '``-joined char symbols with double-space terminators:
    ``"the" -> "  t  h  e  "``."""
    return F.concat(
        F.lit("  "), F.array_join(F.split(word_col, ""), "  "), F.lit("  ")
    )


def _merge_once(col, a: str, b: str):
    """One greedy left-to-right merge pass of pair (a, b) over a
    double-space symbol string (see module docstring)."""
    return F.replace(col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))


def _syms_of(col):
    """Back from the double-space string to the symbol array."""
    return F.split(F.trim(col), "  +")


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, cnt) — the distinct-word frequency table BPE trains on.
    The only corpus-sized aggregation in the trainer."""
    return (
        docs.select(F.explode(F.expr(TOKENS_SPARK)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 40,
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus; stop early
    when the best pair's weighted frequency drops below ``min_freq``.

    Deterministic: the argmax pair tie-breaks on (count DESC, a ASC,
    b ASC), so the learned merge list is a pure function of the corpus
    (pinned against a pure-Python oracle in ``tests/test_bpe.py``).
    Driver traffic is one row per iteration; the word table itself
    stays distributed throughout."""
    words = word_counts(docs).select(
        _sym_string(F.col("w")).alias("s"), "cnt"
    )
    words = words.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        syms = words.select(_syms_of(F.col("s")).alias("y"), "cnt")
        pairs = syms.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(y, 1, size(y) - 1)").alias("a"),
                    F.expr("slice(y, 2, size(y) - 1)").alias("b"),
                )
            ).alias("p"),
            "cnt",
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(_merge_once(F.col("s"), a, b).alias("s"), "cnt")
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


# ---------------------------------------------------------------------------
# Appliers
# ---------------------------------------------------------------------------


def bpe_apply_expr(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, syms) — tokenize every document with a FIXED merge list,
    applied sequentially in order, as pure chained-replace JVM
    expressions: map-only, zero shuffle, no Python. Word boundaries are
    preserved by tokenizing per word then flattening (BPE never merges
    across words)."""
    per_word = F.transform(
        F.filter(F.expr(TOKENS_SPARK), lambda w: w != ""),
        lambda w: _syms_of(
            _apply_all_fold(w, merges)
        ),
    )
    # NULL text propagates NULL through split/filter/flatten; a missing
    # document segments to the EMPTY sequence (matching the Arrow
    # applier's (t or "").split() and the SQL twin's coalesce)
    syms = F.coalesce(F.flatten(per_word), F.array().cast("array<string>"))
    return docs.select("doc_id", syms.alias("syms"))


def _apply_all_fold(word_col, merges: list[tuple[str, str]]):
    col = _sym_string(word_col)
    for a, b in merges:
        col = _merge_once(col, a, b)
    return col


def bpe_apply_udf(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, syms) — Arrow-batched apply for LEARNED merge lists.
    Same sequential-merge semantics as :func:`bpe_apply_expr` (asserted
    equal in pytest); one Python pass per word with a per-batch memo of
    already-tokenized words, which is what makes thousands of merges
    affordable where a thousand chained codegen'd replaces is not."""
    merge_list = list(merges)

    def seg_word(w: str, memo: dict) -> list[str]:
        hit = memo.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        for a, b in merge_list:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[w] = syms
        return syms

    @F.pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in texts:
            syms: list[str] = []
            for w in (t or "").split():
                syms.extend(seg_word(w, memo))
            out.append(syms)
        return pd.Series(out)

    return docs.select("doc_id", seg(F.col("text")).alias("syms"))


# ---------------------------------------------------------------------------
# Gate-leg summary (+ SQL twin)
# ---------------------------------------------------------------------------


def bpe_doc_summary(docs: DataFrame, merges: list[tuple[str, str]] | None = None) -> DataFrame:
    """(doc_id, n_tokens, n_oov, ids_fp, ids_sum) — per-document BPE
    segmentation summary shaped to union with ``tokenize_with_vocab``
    (the ``corpus_tokenize`` gate entry's ``bpe`` leg): ``n_tokens`` =
    symbol count, ``n_oov`` = single-character symbols (the unmerged
    fallback rate — BPE's analog of out-of-vocabulary), ``ids_fp`` =
    md5 fingerprint of the exact symbol sequence, ``ids_sum`` = exact
    BIGINT sum of each symbol's 60-bit md5 hash mod 1e6 (order-free,
    engine-exact)."""
    if merges is None:
        merges = DEFAULT_MERGES
    segged = bpe_apply_expr(docs, merges)
    return segged.select(
        "doc_id",
        F.expr("size(syms)").cast("long").alias("n_tokens"),
        F.expr("size(filter(syms, x -> length(x) = 1))")
        .cast("long")
        .alias("n_oov"),
        F.md5(F.array_join(F.col("syms"), ",")).alias("ids_fp"),
        F.aggregate(
            F.transform(F.col("syms"), lambda x: md5_long(x) % F.lit(1_000_000)),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        ).alias("ids_sum"),
    )


def bpe_doc_summary_sql(
    merges: list[tuple[str, str]] | None = None, from_sql: str = "documents"
) -> str:
    """DuckDB twin of :func:`bpe_doc_summary` — the same chained
    replaces over the same double-space symbol strings. ``from_sql``
    names any relation with (doc_id, text) — the trainer gate leg points
    it at the closed-form training corpus."""
    if merges is None:
        merges = DEFAULT_MERGES

    def q(s: str) -> str:
        return s.replace("'", "''")

    col = "'  ' || array_to_string(string_split(w, ''), '  ') || '  '"
    for a, b in merges:
        col = f"replace({col}, ' {q(a)}  {q(b)} ', ' {q(a)}{q(b)} ')"
    return f"""
        WITH flat AS (
            SELECT doc_id,
                   coalesce(flatten(list_transform(
                       list_filter({TOKENS_DUCK}, w -> w <> ''),
                       w -> regexp_split_to_array(trim({col}), '  +')
                   )), []::VARCHAR[]) AS syms
            FROM {from_sql}
        )
        SELECT doc_id,
               len(syms)::BIGINT AS n_tokens,
               len(list_filter(syms, x -> length(x) = 1))::BIGINT AS n_oov,
               md5(array_to_string(syms, ',')) AS ids_fp,
               coalesce(list_sum(list_transform(syms, x ->
                   {md5_long_sql('x')} % 1000000)), 0)::BIGINT AS ids_sum
        FROM flat
    """


# ---------------------------------------------------------------------------
# Trainer gate leg (r9): closed-form corpus + pure-Python oracle trainer
# ---------------------------------------------------------------------------

#: Word pool for the closed-form TRAINING corpus of the ``bpet`` gate
#: leg. Lowercase-alpha single-space text, so the whitespace tokenizer
#: is identical in Spark SQL, DuckDB, and Python ``str.split``. The
#: words share bigrams (th/he/in/er/an/re/on) unevenly, so the argmax
#: sequence is non-trivial and tie-breaks actually fire.
TRAIN_POOL: tuple[str, ...] = (
    "the", "then", "there", "thin", "think", "tone", "stone", "loner",
    "inner", "loaner", "anther", "rather", "rethink", "intone", "banner",
    "intern",
)
TRAIN_DOCS = 60
TRAIN_WORDS_PER_DOC = 10


def _train_word(i: int, j: int) -> int:
    """Pool index of word ``j`` of doc ``i`` — the shared closed form."""
    return (i + j * j) % len(TRAIN_POOL)


def train_corpus(spark) -> DataFrame:
    """(doc_id, text) — the deterministic training corpus, generated
    distributed (``spark.range``), identically to :func:`train_corpus_sql`
    and :func:`train_corpus_py`."""
    pool = F.array(*[F.lit(w) for w in TRAIN_POOL])
    j = F.sequence(F.lit(0), F.lit(TRAIN_WORDS_PER_DOC - 1))
    word = lambda jj: F.element_at(
        pool, ((F.col("id") + jj * jj) % len(TRAIN_POOL) + 1).cast("int")
    )
    return spark.range(TRAIN_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform(j, word), " ").alias("text"),
    )


def train_corpus_sql() -> str:
    pool = "[" + ", ".join(f"'{w}'" for w in TRAIN_POOL) + "]"
    return f"""
        SELECT i AS doc_id,
               (SELECT string_agg({pool}[((i + j * j) % {len(TRAIN_POOL)}) + 1],
                                  ' ' ORDER BY j)
                FROM range({TRAIN_WORDS_PER_DOC}) s(j)) AS text
        FROM range({TRAIN_DOCS}) r(i)
    """


def train_corpus_py() -> list[str]:
    return [
        " ".join(
            TRAIN_POOL[_train_word(i, j)] for j in range(TRAIN_WORDS_PER_DOC)
        )
        for i in range(TRAIN_DOCS)
    ]


def bpe_train_py(
    word_counts: dict[str, int], num_merges: int, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Pure-Python reference trainer — the ORACLE twin of
    :func:`bpe_train` (same contract: greedy left-to-right single-merge
    passes, argmax tie-break count DESC then (a, b) ASC). The ``bpet``
    gate leg derives the expected merge list with THIS implementation
    (no Spark involved) and bakes its replay into the DuckDB oracle, so
    a trainer regression flips a driver CORRECTNESS row; an independent
    third copy in ``tests/test_bpe.py`` guards both."""
    words: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_counts.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for k in range(len(syms) - 1):
                p = (syms[k], syms[k + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = max(counts.values())
        if best < min_freq:
            break
        a, b = min(p for p, c in counts.items() if c == best)
        merges.append((a, b))
        merged: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            k = 0
            while k < len(syms):
                if k + 1 < len(syms) and syms[k] == a and syms[k + 1] == b:
                    out.append(a + b)
                    k += 2
                else:
                    out.append(syms[k])
                    k += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        words = merged
    return merges


def train_gate_merges(num_merges: int = 8, min_freq: int = 2) -> list[tuple[str, str]]:
    """The oracle-side merge list for the ``bpet`` leg: pure-Python
    training over the closed-form corpus."""
    wc: dict[str, int] = {}
    for text in train_corpus_py():
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    return bpe_train_py(wc, num_merges, min_freq)
