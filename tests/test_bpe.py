"""BPE tokenizer: distributed trainer vs a pure-Python oracle, the two
appliers' equivalence, greedy-merge edge cases, and the gate-leg summary
shape. The trainer is the one iterative/argmax operator in the text
stack — not SQL-expressible, so this suite IS its correctness gate."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from timeseries_db_spark.operators import bpe
from timeseries_db_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _py_train(word_counts: dict, n: int, min_freq: int = 2):
    """Reference BPE trainer: greedy left-to-right single-merge passes,
    argmax tie-break (count DESC, a ASC, b ASC) — the exact contract of
    :func:`bpe.bpe_train`."""
    words = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for _ in range(n):
        pc: Counter = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        top_cnt = max(pc.values())
        if top_cnt < min_freq:
            break
        pair = sorted(p for p, c in pc.items() if c == top_cnt)[0]
        out.append(pair)
        words = _py_merge(words, pair)
    return out


def _py_merge(words: dict, pair):
    a, b = pair
    new: dict = {}
    for syms, c in words.items():
        o, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                o.append(a + b)
                i += 2
            else:
                o.append(syms[i])
                i += 1
        new[tuple(o)] = new.get(tuple(o), 0) + c
    return new


def _py_apply(text: str, merges) -> list:
    syms_out = []
    for w in (text or "").split():
        words = {tuple(w): 1}
        for pair in merges:
            words = _py_merge(words, pair)
        syms_out.extend(next(iter(words)))
    return syms_out


def test_trainer_matches_python_oracle(spark, docs):
    sub = docs.limit(60)
    learned = bpe.bpe_train(sub, num_merges=12)
    wc: Counter = Counter()
    for r in sub.select("text").collect():
        for w in (r["text"] or "").split():
            if w:
                wc[w] += 1
    assert learned == _py_train(dict(wc), 12)
    assert len(learned) == 12  # corpus is big enough to sustain 12 merges


def test_trainer_final_state_equals_sequential_apply(spark, docs):
    """Applying the learned merge list from scratch must reproduce the
    trainer's own final segmentation — the property that makes a frozen
    merge table a faithful artifact of training."""
    sub = docs.limit(40)
    merges = bpe.bpe_train(sub, num_merges=8)
    applied = {
        r["doc_id"]: r["syms"]
        for r in bpe.bpe_apply_udf(sub, merges).collect()
    }
    for r in sub.select("doc_id", "text").collect():
        assert applied[r["doc_id"]] == _py_apply(r["text"], merges)


def test_expr_and_udf_appliers_agree(spark, docs):
    sub = docs.limit(50)
    a = {
        r["doc_id"]: r["syms"]
        for r in bpe.bpe_apply_expr(sub, bpe.DEFAULT_MERGES).collect()
    }
    b = {
        r["doc_id"]: r["syms"]
        for r in bpe.bpe_apply_udf(sub, bpe.DEFAULT_MERGES).collect()
    }
    assert a == b


def test_gate_corpus_trainer_matches_all_three_twins(spark):
    """The r9 `bpet` gate leg's contract, pinned locally: the Spark
    trainer over the closed-form training corpus must learn exactly the
    merge list of bpe.bpe_train_py (the oracle-side twin the gate bakes
    into its SQL) AND of this test file's own independent _py_train —
    and the corpus must sustain the full 8 merges so all 8 argmax
    iterations actually run."""
    tc = bpe.train_corpus(spark)
    learned = bpe.bpe_train(tc, num_merges=8)
    assert len(learned) == 8
    assert learned == bpe.train_gate_merges(8)
    wc: Counter = Counter()
    for text in bpe.train_corpus_py():
        for w in text.split():
            wc[w] += 1
    assert learned == _py_train(dict(wc), 8)
    # the Spark generator and the Python closed form emit the same docs
    got = {r["doc_id"]: r["text"] for r in tc.collect()}
    assert got == dict(enumerate(bpe.train_corpus_py()))


def test_greedy_merge_edge_cases(spark):
    """Self-pair overlap ('aaaa' -> [aa, aa], 'aaa' -> [aa, a]) and the
    chained double-space replace must agree with the reference greedy
    pass — the exact seam where a naive single-space replace breaks."""
    rows = [
        (1, "aaaa aaa ab aab the"),
        (2, ""),
        (3, "   "),
        (4, "x"),
        (5, None),  # NULL text segments to [] in BOTH appliers
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [("a", "a"), ("t", "h"), ("th", "e"), ("a", "b")]
    got = {r["doc_id"]: r["syms"] for r in bpe.bpe_apply_expr(df, merges).collect()}
    udf = {r["doc_id"]: r["syms"] for r in bpe.bpe_apply_udf(df, merges).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == _py_apply(text, merges), (doc_id, text)
        assert udf[doc_id] == got[doc_id], (doc_id, text)
    assert got[1] == ["aa", "aa", "aa", "a", "ab", "aa", "b", "the"]
    assert got[2] == [] and got[3] == [] and got[5] == []
    # and the summary row for a NULL doc is the empty segmentation,
    # not NULLs
    s = {r["doc_id"]: r for r in bpe.bpe_doc_summary(df, merges).collect()}
    assert s[5]["n_tokens"] == 0 and s[5]["ids_sum"] == 0
    assert s[5]["ids_fp"] is not None


def test_doc_summary_counts(spark):
    df = spark.createDataFrame([(1, "the the in x")], "doc_id long, text string")
    row = bpe.bpe_doc_summary(df).collect()[0]
    # 'the' -> [the] via (t,h)+(th,e); 'in' -> [in]; 'x' -> [x]
    assert row["n_tokens"] == 4
    assert row["n_oov"] == 1  # only 'x' stays a single char


# ---------------------------------------------------------------------------
# Hypothesis fuzz (no SparkSession): the double-space replace encoding
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_sym_alpha = st.characters(
    min_codepoint=0x21, max_codepoint=0x7E
)  # printable, no spaces (words are whitespace-split upstream)
_words = st.text(alphabet=_sym_alpha, min_size=1, max_size=12)


@settings(max_examples=500, deadline=None)
@given(
    word=_words,
    pairs=st.lists(
        st.tuples(
            st.text(alphabet=_sym_alpha, min_size=1, max_size=3),
            st.text(alphabet=_sym_alpha, min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=6,
    ),
)
def test_replace_encoding_equals_greedy_merge(word, pairs):
    """The engine trick under everything: one literal
    ``replace(' a  b ', ' ab ')`` over the DOUBLE-space symbol string
    == the index-based greedy left-to-right merge pass. Python's
    str.replace shares the scan-continue-after-replacement semantics of
    Spark's and DuckDB's replace, so fuzzing it pins the encoding for
    all three. Merges chain sequentially, so later pairs see the
    synthetic multi-char symbols earlier merges created."""
    syms = list(word)
    s = "  " + "  ".join(syms) + "  "
    for a, b in pairs:
        # reference greedy pass on the symbol list
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        # encoded pass
        s = s.replace(f" {a}  {b} ", f" {a}{b} ")
        assert re.split(r"  +", s.strip()) == syms if syms else s.strip() == ""
