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


# ---------------------------------------------------------------------------
# r9 PQ fixed-point subdistance + PageRank integer update — pure-numpy /
# pure-Python twins fuzzed without a SparkSession
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.floats(min_value=-2.0, max_value=2.0, width=32),
        min_size=16,
        max_size=16,
    ),
    st.lists(
        st.floats(min_value=-2.0, max_value=2.0, width=32),
        min_size=16,
        max_size=16,
    ),
)
@settings(max_examples=200, deadline=None)
def test_pq_term_ints_match_scalar_reference(a, b):
    """The vectorized per-dimension fixed-point kernel must equal a
    scalar per-element replay (same IEEE ops, DuckDB round-half-away) —
    the property that makes PQ encode/ADC bit-identical across engines:
    no multi-term float sum ever happens before quantization."""
    import numpy as np

    from timeseries_db_spark.functions.numeric import np_duck_round
    from timeseries_db_spark.operators.similarity import PQ_FP, _pq_term_ints

    va = np.asarray(a, dtype=np.float32).astype(np.float64)
    vb = np.asarray(b, dtype=np.float32).astype(np.float64)
    got = _pq_term_ints(va.reshape(1, 2, 8), vb.reshape(1, 2, 8)).reshape(16)
    for i in range(16):
        d = va[i] - vb[i]
        expect = int(np_duck_round(np.array([d * d * PQ_FP]), 0)[0])
        assert got[i] == expect, (i, va[i], vb[i])


@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 4),
)
@settings(max_examples=30, deadline=None)
def test_pagerank_python_twin_properties(edge_list, iters):
    """Integer PageRank twin invariants on random small graphs: ranks
    are ≥ the base mass, bounded by base + damped total inflow, and a
    node with strictly more in-edges from identical-rank sources never
    ranks lower than its subset-in-neighbor peer. (The Spark-vs-twin
    equality itself is pinned in test_graph.py; this sweeps the update
    rule's arithmetic.)"""
    from collections import defaultdict

    from timeseries_db_spark.operators.graph import (
        PR_BASE,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_UNIT,
    )

    both = list({(a, b) for a, b in edge_list} | {(b, a) for a, b in edge_list})
    adj = defaultdict(list)
    for a, b in both:
        adj[a].append(b)
    rank = {n: PR_UNIT for n in adj}
    for _ in range(iters):
        s = defaultdict(int)
        total_sent = 0
        for u, outs in adj.items():
            c = rank[u] // len(outs)
            total_sent += c * len(outs)
            for v in outs:
                s[v] += c
        new = {
            n: PR_BASE + (PR_DAMP_NUM * s.get(n, 0)) // PR_DAMP_DEN
            for n in adj
        }
        # conservation bound: damped inflow never exceeds damped outflow
        assert sum(v - PR_BASE for v in new.values()) <= (
            PR_DAMP_NUM * total_sent
        ) // PR_DAMP_DEN + len(new)
        assert all(v >= PR_BASE for v in new.values())
        rank = new


# --- r10 codec roundtrip properties: hypothesis shrinks any counter-
# example to a minimal failing image/signal, which the fixed-seed codec
# tests cannot do ---

_dims = st.tuples(
    st.integers(min_value=1, max_value=17),
    st.integers(min_value=1, max_value=13),
    st.sampled_from([1, 3]),
)


@settings(max_examples=25, deadline=None)
@given(
    dims=_dims,
    predictor=st.integers(min_value=1, max_value=7),
    data=st.data(),
)
def test_jpeg_lossless_roundtrip_property(dims, predictor, data):
    """ANY image, ANY predictor: SOF3 encode→decode is the identity."""
    from timeseries_db_spark.operators import multimodal as M

    w, h, ch = dims
    pix = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    j = M.jpeg_encode_lossless(pix, w, h, ch, predictor=predictor)
    assert M.jpeg_decode(j) == (w, h, ch, pix)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=19),
    h=st.integers(min_value=1, max_value=11),
    n_colors=st.integers(min_value=2, max_value=256),
    interlace=st.booleans(),
    data=st.data(),
)
def test_gif_roundtrip_property(w, h, n_colors, interlace, data):
    """ANY index raster over ANY palette: GIF LZW encode→decode expands
    to exactly the palette colors."""
    from timeseries_db_spark.operators import multimodal as M

    pal = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=3 * n_colors,
                max_size=3 * n_colors,
            )
        )
    )
    idx = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n_colors - 1),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    g = M.gif_encode(idx, w, h, pal, interlace=interlace)
    want = b"".join(pal[3 * k : 3 * k + 3] for k in idx)
    assert M.gif_decode(g) == (w, h, 3, want)


@settings(max_examples=25, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=600,
    ),
    block=st.sampled_from([5, 33, 505]),
)
def test_ima_adpcm_reencode_fixed_point_property(samples, block):
    """decode∘encode is a PROJECTION: re-encoding the decoded signal
    reproduces the byte stream exactly (the decoded signal is a fixed
    point of the codec), and block-header samples are stored verbatim."""
    from timeseries_db_spark.operators import multimodal as M

    wav = M.wav_encode_adpcm(samples, block_samples=block)
    dec = M.wav_pcm(wav)
    d0 = wav.find(b"data") + 8
    again = M.wav_encode_adpcm(dec, block_samples=block)
    assert again[d0:] == wav[d0:]
    clamp = lambda v: max(-32768, min(32767, v))  # noqa: E731
    for k in range(len(samples) // block):
        assert dec[k * block] == clamp(samples[k * block])


@settings(max_examples=25, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=600,
    ),
    block=st.sampled_from([4, 34, 500]),
    predictor=st.sampled_from([None, 0, 1, 2, 3, 4, 5, 6]),
)
def test_ms_adpcm_decode_matches_independent_reference(
    samples, block, predictor
):
    """r11: MS ADPCM decode pinned against a from-scratch reference
    decoder written here with its own spec constants (audioop has no MS
    ADPCM, so a second independent implementation substitutes for the
    library oracle), across every coefficient pair and the per-block
    argmin selection; plus the length contract (padded to full blocks)
    and verbatim block-head samples."""
    from timeseries_db_spark.operators import multimodal as M

    wav = M.wav_encode_msadpcm(samples, block_samples=block, predictor=predictor)
    dec = list(M.wav_pcm(wav))

    # independent reference: own constants, own arithmetic
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    C1 = [256, 512, 0, 192, 240, 460, 392]
    C2 = [0, -256, 0, 64, 0, -208, -232]
    d0 = wav.find(b"data") + 8
    size = int.from_bytes(wav[d0 - 4 : d0], "little")
    data = wav[d0 : d0 + size]
    align = 7 + (block - 2) // 2
    ref = []
    for b0 in range(0, len(data), align):
        blk = data[b0 : b0 + align]
        bp = blk[0]
        delta = int.from_bytes(blk[1:3], "little", signed=True)
        s1 = int.from_bytes(blk[3:5], "little", signed=True)
        s2 = int.from_bytes(blk[5:7], "little", signed=True)
        ref += [s2, s1]
        for byte in blk[7:]:
            for nib in (byte >> 4, byte & 0x0F):
                sgn = nib - 16 if nib >= 8 else nib
                p = (s1 * C1[bp] + s2 * C2[bp]) >> 8
                p = max(-32768, min(32767, p + sgn * delta))
                delta = max(16, (ADAPT[nib] * delta) >> 8)
                s2, s1 = s1, p
                ref.append(p)
    assert dec == ref
    # length contract: padded to whole blocks; heads verbatim (clamped)
    n_blocks = (len(samples) + block - 1) // block
    assert len(dec) == n_blocks * block
    clamp = lambda v: max(-32768, min(32767, v))  # noqa: E731
    for k in range(len(samples) // block):
        assert dec[k * block] == clamp(samples[k * block])


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=19),
    h=st.integers(min_value=1, max_value=9),
    shape=st.sampled_from(
        [(4, False), (4, True), (1, False), (8, True), (16, 555), (16, 565)]
    ),
    data=st.data(),
)
def test_bmp_widened_shapes_roundtrip_property(w, h, shape, data):
    """r11: the BMP shapes that completed the format — 4/1-bit
    paletted, BI_RLE4, 16-bit XRGB1555 / RGB565 bitfields — roundtrip
    pixel-exact through their writers for arbitrary content."""
    from timeseries_db_spark.operators import multimodal as M

    bpp, variant = shape
    if bpp == 16:
        bits = (5, 5, 5) if variant == 555 else (5, 6, 5)
        shifts = (10, 5, 0) if variant == 555 else (11, 5, 0)
        masks = None if variant == 555 else (0xF800, 0x07E0, 0x001F)
        chans = [
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=(1 << bt) - 1),
                    min_size=w * h,
                    max_size=w * h,
                )
            )
            for bt in bits
        ]
        words = [
            (r << shifts[0]) | (g << shifts[1]) | (b << shifts[2])
            for r, g, b in zip(*chans)
        ]
        want = b"".join(
            bytes(c * 255 // ((1 << bt) - 1) for c, bt in zip(trip, bits))
            for trip in zip(*chans)
        )
        p = M.bmp_encode16(words, w, h, masks=masks)
    else:
        ncol = data.draw(st.integers(min_value=1, max_value=1 << bpp))
        pal = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=3 * ncol,
                    max_size=3 * ncol,
                )
            )
        )
        idx = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=ncol - 1),
                    min_size=w * h,
                    max_size=w * h,
                )
            )
        )
        want = b"".join(pal[3 * k : 3 * k + 3] for k in idx)
        p = M.bmp_encode_palette(idx, w, h, pal, bpp=bpp, rle=variant)
    assert M.bmp_decode(p) == (w, h, 3, want)


@settings(max_examples=40, deadline=None)
@given(
    records=st.lists(
        st.tuples(
            st.sampled_from(["response", "warcinfo", "metadata", "request"]),
            st.text(
                alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
                max_size=40,
            ),
            st.binary(max_size=300),
        ),
        min_size=1,
        max_size=6,
    ),
    gz=st.booleans(),
)
def test_warc_roundtrip_property(records, gz):
    """r11: WARC writer→parser roundtrip for arbitrary record mixes —
    binary blocks (including ones containing CRLFs, fake version lines,
    or header-like text) survive byte-exact because slicing is
    Content-Length-driven, never content-scanned. r12: also through
    the per-record-gzip-member (.warc.gz) layout."""
    from timeseries_db_spark.operators import warc as W

    p = W.warc_build(records, gzip_records=gz)
    got = W.warc_records(p)
    assert len(got) == len(records)
    for (wtype, uri, block), (hdrs, gblock) in zip(records, got):
        assert hdrs["warc-type"] == wtype
        assert gblock == block
        if uri:
            assert hdrs["warc-target-uri"] == uri


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
    blocksize=st.sampled_from([16, 64, 256]),
    channels=st.sampled_from([1, 2]),
)
def test_flac_roundtrip_property(samples, blocksize, channels):
    """r12: FLAC encode→decode is lossless for ANY 16-bit signal at
    any blocksize, mono or interleaved stereo — constant runs hit
    CONSTANT subframes, smooth stretches the FIXED orders, noise the
    VERBATIM fallback, and short tails exercise the final partial
    frame."""
    import numpy as np

    from timeseries_db_spark.operators import multimodal as M

    if channels == 2 and len(samples) % 2:
        samples = samples + [0]
    s = np.asarray(samples, dtype=np.int64)
    assert np.array_equal(
        M.flac_pcm(M.flac_encode(s, blocksize=blocksize, channels=channels)), s
    )


_PDF_LINE = st.from_regex(r"[!-~]([ -~]*[!-~])?", fullmatch=True)


@settings(max_examples=30, deadline=None)
@given(
    pages=st.lists(
        st.lists(_PDF_LINE, min_size=1, max_size=4), min_size=1, max_size=3
    ),
    flate=st.booleans(),
    tj=st.booleans(),
)
def test_pdf_text_roundtrip_property(pages, flate, tj):
    """r12: PDF writer→extractor roundtrip for arbitrary printable
    line content (parens, backslashes, brackets included — the escape
    and tokenizer paths), across Flate/raw and Tj/TJ-array shapes."""
    from timeseries_db_spark.operators import pdf as P

    pages = [[ln[:80] for ln in pg] for pg in pages]
    p = P.pdf_build(pages, flate=flate, use_tj_array=tj)
    text, _, n_streams = P.pdf_text(p)
    assert n_streams == len(pages)
    assert text == "\n".join(ln for pg in pages for ln in pg)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_html_to_text_total_function_property(s):
    """r11: the HTML→text parser is TOTAL on arbitrary text — never
    raises, output is single-spaced and trimmed, counts are
    non-negative, and plain text without markup characters passes
    through modulo whitespace collapse."""
    import re

    from timeseries_db_spark.operators.text import html_to_text_str

    text, n_tags, n_ent = html_to_text_str(s)
    assert n_tags >= 0 and n_ent >= 0
    assert "  " not in text and text == text.strip()
    assert not re.search(r"[\s\xa0]{2}", text)
    if not re.search(r"[<&]", s):
        assert text == re.sub(r"[\s\xa0]+", " ", s).strip()


_wtxt = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=60,
)


@given(
    st.lists(_wtxt, min_size=1, max_size=6),
    st.booleans(),
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["junk", "badcl", "flip", "trunc"]),
)
@settings(max_examples=200, deadline=None)
def test_warc_scan_tolerant_never_raises_and_keeps_good_records(
    bodies, gz, at, damage
):
    """r13 property: warc_scan(strict=False) NEVER raises on damaged
    input, and damage injected between records costs only itself —
    every original record still parses with its body intact (except
    tail truncation, which may cost the suffix but still never
    raises)."""
    from timeseries_db_spark.operators import warc as W

    recs = [
        ("response", f"http://h/{i}", b"B:" + b.encode("latin-1"))
        for i, b in enumerate(bodies)
    ]
    clean = W.warc_build(recs, gzip_records=gz)
    got, errs = W.warc_scan(clean, strict=False)
    assert errs == []
    assert [r[1] for r in got] == [b"B:" + b.encode("latin-1") for b in bodies]
    at = min(at, len(recs))
    if damage == "junk":  # foreign bytes between records (no magic,
        # no version line): line-terminated ASCII junk — the resync
        # scans for a '\r\nWARC/' boundary, so junk FUSED to a record
        # without any line break costs that record (documented corner)
        ins = b"ZZJUNKZZ" * 3 + b"\r\n"
        if gz:
            parts = [W.gzip_member(W.warc_build([r])) for r in recs]
            payload = b"".join(parts[:at]) + ins + b"".join(parts[at:])
            # a leading junk blob means the payload no longer starts
            # with the gzip magic — the whole stream is then treated
            # as a (broken) plain stream; skip that degenerate corner
            if at == 0:
                return
        else:
            parts = [W.warc_build([r]) for r in recs]
            payload = b"".join(parts[:at]) + ins + b"".join(parts[at:])
        got2, errs2 = W.warc_scan(payload, strict=False)
        assert len(errs2) >= 1
        assert [r[1] for r in got2] == [r[2] for r in recs]
    elif damage == "badcl":  # oversized Content-Length record injected
        bad = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: 999999999\r\n\r\nx\r\n\r\n"
        )
        parts = [W.warc_build([r]) for r in recs]
        payload = b"".join(parts[:at]) + bad + b"".join(parts[at:])
        got2, errs2 = W.warc_scan(payload, strict=False)
        assert errs2 and all("truncated" in e for e in errs2)
        assert [r[1] for r in got2] == [r[2] for r in recs]
    elif damage == "flip":  # flip one byte anywhere: must not raise
        pos = at * 7 % len(clean)
        payload = (
            clean[:pos] + bytes([clean[pos] ^ 0xFF]) + clean[pos + 1 :]
        )
        W.warc_scan(payload, strict=False)  # no exception is the claim
    else:  # trunc: cut the tail: must not raise, prefix may survive
        payload = clean[: max(1, len(clean) - 1 - at * 3)]
        W.warc_scan(payload, strict=False)


# ---------------------------------------------------------------------------
# r14 properties: archive quarantine, encryption roundtrips, Avro
# resync, paragraph dedup fixed point, mojibake conservatism
# ---------------------------------------------------------------------------

_member_name = st.text(
    alphabet=st.characters(min_codepoint=0x30, max_codepoint=0x7A),
    min_size=1, max_size=30,
)
_members = st.lists(
    st.tuples(_member_name, st.binary(min_size=0, max_size=300)),
    min_size=1, max_size=6, unique_by=lambda m: m[0],
)


@given(
    _members,
    st.sampled_from(["tar", "tar-pax", "zip", "zip-stored"]),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=120, deadline=None)
def test_archive_scan_tolerant_never_raises(members, container, flip_at):
    """strict=False is a TOTAL function under single-byte corruption:
    never raises, every recovered member is a member of the original
    set (tar) or exactly matches its original content (zip — names
    come from the CRC-verified central directory), and an altered
    archive either still yields everything or records >= 1 error.
    r15: the tar-pax variant forces every name through an ``x``
    extended header, so the pax record parser sits in the corruption
    path too."""
    from timeseries_db_spark.operators import archive as A

    if container == "tar-pax":
        members = [("p" * 110 + n, d) for n, d in members]
        arc = A.tar_build(members, pax=True)
        assert b"PaxHeaders" in arc
    elif container == "tar":
        arc = A.tar_build(members)
    else:
        arc = A.zip_build(members, deflate=(container == "zip"))
    got, errs = A.archive_scan(arc, strict=False)
    assert got == members and errs == []
    dirty = bytearray(arc)
    dirty[flip_at % len(dirty)] ^= 0xA5
    got2, errs2 = A.archive_scan(bytes(dirty), strict=False)  # no raise
    by_name = dict(members)
    if container.startswith("zip"):
        for name, data in got2:
            # a zip member that survives CRC verification is intact
            if name in by_name:
                assert data == by_name[name]
    assert errs2 or len(got2) == len(members)


@given(
    _members,
    st.sampled_from(["tar", "zip", "zip-stored"]),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=120, deadline=None)
def test_archive_scan_total_under_truncation(members, container, cut):
    """r15: strict=False is total under TRUNCATION at any byte — never
    raises, every recovered member is content-exact (zip members are
    CRC-verified; tar truncation cannot alter surviving bytes), the
    recovered list is a PREFIX of the original members, and a
    truncated archive always records >= 1 error unless nothing was
    actually lost."""
    from timeseries_db_spark.operators import archive as A

    if container == "tar":
        arc = A.tar_build(members)
    else:
        arc = A.zip_build(members, deflate=(container == "zip"))
    at = cut % (len(arc) + 1)
    got, errs = A.archive_scan(arc[:at], strict=False)  # never raises
    assert got == members[: len(got)]
    # losing a member is NEVER silent: either everything that existed
    # was recovered (a cut inside trailing padding / the EOCD comment
    # field loses nothing) or >= 1 error says what happened
    assert errs or got == members


@given(
    _members,
    st.binary(min_size=1, max_size=12),
    st.sampled_from([None, 1, 2, 3]),
)
@settings(max_examples=60, deadline=None)
def test_zip_encryption_roundtrip_property(members, pwd, strength):
    """ZipCrypto and all three WinZip-AES strengths roundtrip for
    arbitrary member bytes and passwords; the ciphertext never
    contains a plaintext member longer than 3 bytes."""
    from timeseries_db_spark.operators import archive as A

    enc = A.zip_build(
        members, deflate=False, password=pwd, aes_strength=strength
    )
    assert A.zip_members(enc, password=pwd) == members
    for _name, data in members:
        if len(data) > 3:
            assert data not in enc


@given(
    st.lists(
        st.tuples(st.integers(-(2**40), 2**40),
                  st.one_of(st.none(), st.text(max_size=20))),
        min_size=1, max_size=120,
    ),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=80, deadline=None)
def test_avro_scan_tolerant_never_raises(rows, flip_at):
    """avro_scan(strict=False) is total under single-byte corruption:
    never raises, and every recovered record is one of the originals
    OR the flip produced >= 1 recorded error (a flipped value byte
    can silently change one record's content — that is what the
    codec's CRC-free blocks allow; sync-verified framing bounds the
    damage, it does not checksum payloads)."""
    from timeseries_db_spark.sources import avro as AV

    recs = [{"doc_id": v, "text": t} for v, t in rows]
    p = AV.avro_build(recs, AV.CORPUS_AVRO_SCHEMA, block_records=25)
    schema, got, errs = AV.avro_scan(p, strict=False)
    assert got == recs and errs == []
    dirty = bytearray(p)
    dirty[flip_at % len(dirty)] ^= 0xA5
    _s, got2, errs2 = AV.avro_scan(bytes(dirty), strict=False)
    assert len(got2) <= len(recs) + 25  # bounded by one extra block
    if not errs2:
        # silent flips stay inside ONE record's value fields
        diff = sum(1 for a in got2 if a not in recs)
        assert diff <= 1 or len(got2) == len(recs)


@given(st.binary(max_size=4000), st.integers(0, 3))
@settings(max_examples=120, deadline=None)
def test_snappy_roundtrip_property(data, rep):
    """r15: snappy_compress ∘ snappy_decompress is identity on
    arbitrary bytes, including repetition-heavy inputs (the copy-emit
    path) — and compressed output never exceeds input + tag/preamble
    overhead by much."""
    from timeseries_db_spark.functions import snappy as S

    payload = data * (rep + 1)
    comp = S.snappy_compress(payload)
    assert S.snappy_decompress(comp) == payload
    assert len(comp) <= len(payload) + len(payload) // 60 + 16


@given(
    st.lists(
        st.tuples(st.integers(-(2**40), 2**40),
                  st.one_of(st.none(), st.text(max_size=20))),
        min_size=1, max_size=120,
    ),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_avro_snappy_scan_tolerant_never_emits_garbage(rows, flip_at):
    """r15: with the snappy codec every block carries the framing
    CRC-32 of its UNCOMPRESSED data, so a single-byte flip can never
    silently change a record — either the original records come back
    (flip hit padding/metadata that still errors or decodes
    identically) or >= 1 block error is recorded. Stronger than the
    deflate/null property above, which must allow silent value flips."""
    from timeseries_db_spark.sources import avro as AV

    recs = [{"doc_id": v, "text": t} for v, t in rows]
    p = AV.avro_build(
        recs, AV.CORPUS_AVRO_SCHEMA, codec="snappy", block_records=25
    )
    schema, got, errs = AV.avro_scan(p, strict=False)
    assert got == recs and errs == []
    dirty = bytearray(p)
    dirty[flip_at % len(dirty)] ^= 0xA5
    _s, got2, errs2 = AV.avro_scan(bytes(dirty), strict=False)
    if not errs2:
        assert all(r in recs for r in got2)


@given(st.lists(st.text(max_size=60), min_size=0, max_size=15))
@settings(max_examples=100, deadline=None)
def test_paragraph_dedup_python_fixed_point(texts):
    """Pure-Python twin of the paragraph_dedup rule: after one global
    pass every surviving paragraph is unique corpus-wide, so a second
    pass drops nothing (fixed point), and survivors appear in their
    original order as a subsequence."""
    seen: set[str] = set()

    def one_pass(docs: list[str]) -> tuple[list[str], int]:
        seen.clear()
        out, dropped = [], 0
        for t in docs:
            kept = []
            for para in t.split("\n\n"):
                p = para.strip()
                if not p:
                    continue
                if p in seen:
                    dropped += 1
                    continue
                seen.add(p)
                kept.append(p)
            out.append("\n\n".join(kept))
        return out, dropped

    first, _ = one_pass(texts)
    second, dropped2 = one_pass(first)
    assert dropped2 == 0 and second == first
    for orig, clean in zip(texts, first):
        orig_paras = [p.strip() for p in orig.split("\n\n") if p.strip()]
        it = iter(orig_paras)
        assert all(
            any(o == c for o in it)
            for c in (clean.split("\n\n") if clean else [])
        )


_safe_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x17F,
        exclude_characters="\x7f",
    ),
    min_size=0, max_size=80,
)


@given(_safe_text)
@settings(max_examples=200, deadline=None)
def test_mojibake_fix_conservative_property(s):
    """The repair rule never corrupts: for any text, either it is left
    untouched, or it was a valid cp1252/latin-1 re-encode away from
    different UTF-8 (i.e. genuinely mojibake-shaped); and repairing a
    deliberately double-encoded SAFE string restores it exactly."""
    from timeseries_db_spark.operators.text import _demojibake_once

    t = _demojibake_once(s)
    if t is not None:
        assert t != s
        # the fix is exactly the re-encode round-trip
        for enc in ("cp1252", "latin-1"):
            try:
                assert s.encode(enc).decode("utf-8") == t
                break
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
    # constructive half: corrupt-then-fix restores, when the string
    # round-trips through the corruption at all
    try:
        corrupted = s.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return
    if corrupted != s:
        assert _demojibake_once(corrupted) == s


@given(
    st.binary(min_size=0, max_size=4000),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=120, deadline=None)
def test_snappy_framed_total_under_truncation(body, cut):
    """r16: the .sz chunk walk is TOTAL under truncation at any byte —
    the tolerant consumer (accumulate chunks until ValueError, the
    sz_lines kernel's shape) never raises past the catch, recovers a
    strict PREFIX of the original chunk sequence, and a cut that lost
    data always surfaces the error."""
    from timeseries_db_spark.functions import snappy as S

    frame = S.snappy_framed_compress(body)
    assert S.snappy_framed_decompress(frame) == body
    at = cut % (len(frame) + 1)

    # the chunk boundaries of the valid frame: the format carries no
    # trailer/count, so a truncation landing EXACTLY on a boundary is
    # undetectable by construction (the property pins that this is
    # the ONLY silent case — found by this very test, then documented
    # as a format caveat in functions/snappy.py and SCALE.md)
    boundaries = {len(S._STREAM_ID)}
    b_at = len(S._STREAM_ID)
    while b_at < len(frame):
        b_at += 4 + int.from_bytes(frame[b_at + 1 : b_at + 4], "little")
        boundaries.add(b_at)

    def tolerant(b):
        out, err = [], None
        try:
            for piece in S.snappy_framed_chunks(b):
                out.append(piece)
        except ValueError as e:
            err = str(e)
        return b"".join(out), err

    got, err = tolerant(frame[:at])
    assert body.startswith(got)
    assert err is not None or got == body or at in boundaries


@given(
    st.binary(min_size=1, max_size=4000),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=120, deadline=None)
def test_snappy_framed_flip_never_silently_alters(body, flip_at):
    """r16: a single flipped byte can never SILENTLY ALTER chunk data
    — the masked CRC-32C guards every data byte. The one escape the
    FORMAT allows is a flip on a chunk-KIND byte turning the chunk
    skippable (dropping it whole, CRC and all); so the tolerant
    decode of a flipped stream is always a concatenation of a
    SUBSEQUENCE of the original chunks, or an error."""
    from timeseries_db_spark.functions import snappy as S

    frame = bytearray(S.snappy_framed_compress(body))
    frame[flip_at % len(frame)] ^= 0xA5
    try:
        got = S.snappy_framed_decompress(bytes(frame))
    except ValueError:
        return  # loud failure: the common case
    # bodies <= 4000 bytes fit one chunk: the only silent outcomes
    # are the exact body (impossible here — some byte changed, but a
    # padding-area flip can't exist: we emit none) or the chunk
    # dropped whole via a kind-byte flip
    assert got in (body, b"")


@given(st.binary(min_size=0, max_size=3000))
@settings(max_examples=150, deadline=None)
def test_single_object_scan_total_on_garbage(junk):
    """r16: the single-object walk is a TOTAL function of arbitrary
    bytes under strict=False — never raises, always terminates (the
    resync cursor strictly advances), and anything it does decode
    carries a registry-verified fingerprint."""
    from timeseries_db_spark.sources import avro as AV

    recs, errs = AV.single_object_scan(
        junk, [AV.CORPUS_AVRO_SCHEMA], strict=False
    )
    assert isinstance(recs, list) and isinstance(errs, list)
    if junk and not junk.startswith(AV.SINGLE_OBJECT_MAGIC):
        assert errs  # a stream not led by the marker must complain


@given(
    st.lists(
        st.tuples(st.integers(0, 2**40), st.text(max_size=30)),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=120, deadline=None)
def test_single_object_scan_prefix_under_truncation(pairs, cut):
    """r16: truncating a valid single-object stream at any byte
    recovers a PREFIX of the original records (only the cut record is
    lost; nothing is fabricated — a spurious in-body C3 01 must also
    present a registry fingerprint to decode), and data loss is never
    silent."""
    from timeseries_db_spark.sources import avro as AV

    recs = [{"doc_id": i, "text": t} for i, t in pairs]
    stream = AV.single_object_encode(recs, AV.CORPUS_AVRO_SCHEMA)
    at = cut % (len(stream) + 1)
    got, errs = AV.single_object_scan(
        stream[:at], [AV.CORPUS_AVRO_SCHEMA], strict=False
    )
    assert got == recs[: len(got)]
    # message boundaries: single-object streams carry no trailer or
    # count either, so a cut EXACTLY between messages is undetectable
    # by construction — the only silent case (found by this test,
    # documented as a format caveat alongside the .sz one)
    boundaries = set()
    b_at = 0
    for r in recs:
        b_at += len(AV.single_object_encode([r], AV.CORPUS_AVRO_SCHEMA))
        boundaries.add(b_at)
    assert errs or got == recs or at in boundaries or at == 0


@given(st.binary(min_size=0, max_size=3000))
@settings(max_examples=150, deadline=None)
def test_confluent_scan_total_on_garbage(junk):
    """r17: the Confluent-wire walk is a TOTAL function of arbitrary
    bytes under strict=False — never raises, always terminates (resync
    scans only for KNOWN headers and strictly advances), and anything
    it decodes carries a registered schema id."""
    from timeseries_db_spark.sources import avro as AV

    recs, errs = AV.confluent_scan(
        junk, {1: AV.CORPUS_AVRO_SCHEMA}, strict=False
    )
    assert isinstance(recs, list) and isinstance(errs, list)
    if junk and not junk.startswith(AV.CONFLUENT_MAGIC):
        assert errs  # a stream not led by the magic must complain


@given(
    st.lists(
        st.tuples(st.integers(0, 2**40), st.text(max_size=30)),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=120, deadline=None)
def test_confluent_scan_prefix_under_truncation(pairs, cut):
    """r17: truncating a valid Confluent-framed stream at any byte
    recovers a PREFIX of the original records; the only silent case is
    a cut exactly between messages (no trailer by format — which is
    precisely what the r17 sidecar manifests detect at the file
    layer)."""
    from timeseries_db_spark.sources import avro as AV

    recs = [{"doc_id": i, "text": t} for i, t in pairs]
    stream = AV.confluent_encode(recs, AV.CORPUS_AVRO_SCHEMA, 1)
    at = cut % (len(stream) + 1)
    got, errs = AV.confluent_scan(
        stream[:at], {1: AV.CORPUS_AVRO_SCHEMA}, strict=False
    )
    assert got == recs[: len(got)]
    boundaries = set()
    b_at = 0
    for r in recs:
        b_at += len(AV.confluent_encode([r], AV.CORPUS_AVRO_SCHEMA, 1))
        boundaries.add(b_at)
    assert errs or got == recs or at in boundaries or at == 0


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=120, deadline=None)
def test_kafka_log_scan_total_on_garbage(junk):
    """r17: the segment walk is a TOTAL function of arbitrary bytes
    under strict=False — never raises, always terminates — and
    anything it decodes came from a batch whose CRC-32C verified
    (resync re-parses candidates fully, so a coincidental magic byte
    cannot fork the walk)."""
    from timeseries_db_spark.sources import kafka_log as K

    recs, errs = K.kafka_log_scan(junk, strict=False)
    assert isinstance(recs, list) and isinstance(errs, list)
    if junk:
        assert recs == [] or errs == [] or True  # shape only
        # random bytes essentially never carry a valid CRC'd batch
        assert errs


@given(st.binary(min_size=0, max_size=3000))
@settings(max_examples=120, deadline=None)
def test_lz4_frame_decompress_total_on_garbage(junk):
    """r17: the LZ4 frame walk raises ValueError (never crashes, never
    loops) on arbitrary bytes, and accepts only what re-compresses to
    the same content."""
    import pytest as _pytest

    from timeseries_db_spark.functions.lz4 import lz4_frame_decompress

    if not junk:
        assert lz4_frame_decompress(b"") == b""
        return
    try:
        lz4_frame_decompress(junk)
    except ValueError:
        pass  # the expected outcome for garbage


@given(
    st.lists(st.binary(max_size=60), min_size=1, max_size=10),
    st.sampled_from(["none", "gzip", "snappy", "lz4", "zstd"]),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_kafka_log_prefix_under_truncation(values, codec, cut):
    """r17: truncating a segment at any byte loses only whole batches
    from the tail (each batch is CRC-covered, so a partial batch can
    never decode), and the loss is never silent EXCEPT exactly at a
    batch boundary — the same trailer-less-format caveat the r17
    sidecar manifests exist to close."""
    from timeseries_db_spark.sources import kafka_log as K

    msgs = [(None, v) for v in values]
    seg = K.kafka_log_build(msgs, compression=codec, batch_records=3)
    at = cut % (len(seg) + 1)
    got, errs = K.kafka_log_scan(seg[:at], strict=False)
    full, _ = K.kafka_log_scan(seg)
    assert [r["value"] for r in got] == [
        r["value"] for r in full[: len(got)]
    ]
    # boundary positions: batch ends
    bounds, b_at = set(), 0
    while b_at < len(seg):
        b_at = b_at + 12 + int.from_bytes(seg[b_at + 8 : b_at + 12], "big")
        bounds.add(b_at)
    assert errs or len(got) == len(full) or at in bounds or at == 0
