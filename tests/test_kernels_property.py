"""Hypothesis fuzz for the vectorized Arrow kernels against slow,
obviously-correct pure-Python references — no SparkSession needed, so
this sweeps far more inputs per second than the engine-level mirrors.
The kernels' cross-ENGINE twins (SQL/DuckDB) are covered in
``test_text.py`` / ``test_registry.py``; this file pins the numpy
vectorization itself (window arithmetic, batch concatenation offsets,
doc-boundary masking, int64 overflow headroom)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseries_db_spark.operators.text import (
    KGRAM,
    KGRAM_BASE,
    KGRAM_MOD,
    LANG_LEXICONS,
    QUALITY_STOPWORDS,
    _kgram_fp_kernel,
    _token_stats_kernel,
)

#: printable ASCII only — the SQL _kgram_prep sanitizes to this range
#: upstream, so the kernel's contract starts here
printable = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=200,
)


def _prep(s: str) -> str:
    """Python twin of the SQL sanitize+pad (input already printable)."""
    return s.ljust(KGRAM) if len(s) < KGRAM else s


def _kgram_ref(s: str) -> tuple[int, int]:
    """Slow reference: fold every window independently."""
    s = _prep(s)
    hashes = []
    for i in range(len(s) - KGRAM + 1):
        h = ord(s[i])
        for j in range(1, KGRAM):
            h = (h * KGRAM_BASE + ord(s[i + j])) % KGRAM_MOD
        hashes.append(h)
    return len(set(hashes)), min(hashes)


@given(st.lists(printable, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_kgram_kernel_matches_pure_python(texts):
    out = _kgram_fp_kernel(pd.Series([_prep(t) for t in texts]))
    for i, t in enumerate(texts):
        n_ref, min_ref = _kgram_ref(t)
        assert out["n_kgrams"].iloc[i] == n_ref
        assert out["min_fp"].iloc[i] == min_ref


token = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
    min_size=0,
    max_size=12,
)


@given(st.lists(st.lists(token, min_size=1, max_size=40), min_size=1, max_size=10))
@settings(max_examples=200, deadline=None)
def test_token_stats_kernel_matches_pure_python(docs):
    out = _token_stats_kernel(pd.Series(docs))
    langs = sorted(LANG_LEXICONS)
    for i, toks in enumerate(docs):
        assert out["stop_hits"].iloc[i] == sum(t in QUALITY_STOPWORDS for t in toks)
        for l in langs:
            assert out[f"sc_{l}"].iloc[i] == sum(
                t in LANG_LEXICONS[l] for t in toks
            )
        assert out["n_distinct"].iloc[i] == len(set(toks))
        assert out["top_cnt"].iloc[i] == max(toks.count(t) for t in set(toks))
        g2 = list(zip(toks, toks[1:]))
        assert out["n_g2"].iloc[i] == len(g2)
        assert out["n_g2_distinct"].iloc[i] == len(set(g2))
        assert out["tok_chars"].iloc[i] == sum(len(t) for t in toks)


def test_kernels_null_passthrough():
    k = _kgram_fp_kernel(pd.Series(["exactly8", None]))
    assert k["n_kgrams"].iloc[0] == 1 and pd.isna(k["n_kgrams"].iloc[1])
    t = _token_stats_kernel(pd.Series([["a"], None]))
    assert t["n_distinct"].iloc[0] == 1 and pd.isna(t["n_distinct"].iloc[1])
