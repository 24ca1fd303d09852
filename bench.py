"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed end-to-end (plan build + execution + full result
materialization on the driver). A warmup query first pays JVM/codegen
startup so the numbers measure the engine, not JIT.

r6 note (round-over-round comparability): materialization switched from
``collect()`` (row objects through the Python pickler) to Arrow-batched
``toPandas()`` — the path a real analytics consumer uses. This only
moves the needle on the large-result entries (range_scan_9combos ~640k
rows: 5.7s → 1.7s of pure driver-side deserialization at sf0.1;
asof_hourly_enrich / derivatives_by_tag similar); the engine-side plan
time is unchanged, so per-query deltas beyond those entries reflect
plan work, not the harness.

Round-over-round comparability: r2 folded parameter families into union
entries (one entry = N r1 queries' work — e.g. range_scan_9combos runs
all 9 range scans AND collects ~9× the rows r1's single range_ge_lt
did) and added gapfill/simhash/IVF coverage, so r2's total covers ~2.5×
the work of r1's 13-query total. Compare per-query where names persist
(agg_by_ts≈agg_sum_by_ts+count, asof_hourly_enrich, join_*,
running_totals_by_tag, dedup_minhash_lsh, sim_cosine_topk), not
totals; late-r2 folded the five text_* entries into one-scan
text_features, so text_quality_score's column is superseded.

r7 fold mapping (headline list PINNED at the same 19 names as r6 —
apples-to-apples): agg_scalar_all / agg_by_tag_all / agg_by_ts /
li_by_tag now compute their aggregate legs in ONE scan (stack-unpivot)
instead of one scan per leg — same rows, same oracles, less I/O; their
r7 columns measure the same logical work as r6. Non-headline registry
folds this round (fx_edge_bounds+fx_grouped→fx_surface,
multimodal_frame_plan→multimodal_resize_plan union leg,
curate_corpus→corpus_curation_topk union leg) don't touch the headline
list. Late-r7 exception: dedup_simhash_sig+dedup_simhash_pairs folded
into dedup_simhash (freed the gate slot for the new text_lm_score CCNet
LM scorer) — its headline column measures r6's dedup_simhash_pairs work
PLUS one signature-assembly projection (the sig rows), so compare it
against r6's dedup_simhash_pairs plus ~0.15s.

r8 cold/warm split (VERDICT r7 item 6): best-of-3 mixes a cold first
run (persist-tracked cache BUILD, e.g. dedup_simhash's shared signature
table) with warm repeats — which made r7's dedup_simhash look 2× off
its fold note. The JSON now carries queries_first_run (cold, the
driver-gate shape) alongside best and median; fold-mapping claims are
stated against first_run. r8 legs added to existing headline entries:
gapfill_hourly += interp (one-union two-direction running-frame fill),
derivatives_by_tag += zscore (broadcast-moments filter) + roll (the
skew-safe carried-frame trailing average — the heavy add; late-r8 it
collapsed from cumulative-pass + bucketed as-of self-probe to ONE
exchange + one fused incremental window, ~2x warm),
join_revenue_by_nation += iv_cnt/iv_sum (bucketed point-in-interval
join over events) — those three r8 columns cover strictly more work
than r7's same-named columns. Late-r8: text_vocab_topn += bm25 (BM25
query top-20 — one extra filtered explode + two tiny broadcasts) +=
cms (count-min probe of the vocab — one more token explode onto a
4096-row counter table), agg_ndv_by_tag += hll; the non-headline
corpus_tokenize / sim_quantize_int8 entries gained bpe / rp legs.
Later still: the BM25 leg dropped two of its three corpus tokenize
passes (stats derive from the shared token_counts table; the k-row top
is cached across the rank join's two references), and
join_revenue_by_nation gained ov_cnt/ov_ms legs (interval-overlap
join: sessions ∩ maintenance windows — one extra user-keyed window
pass + a bucketed interval self-explode join), so its column again
covers strictly more work than earlier rounds. Non-headline entries
gained scrub (dedup_ngram_jaccard), cdoc (stream_ingest_dedup — a full
streaming corpus-ingest run), tok_hll/hll_union/hll_inter
(agg_ndv_by_tag), and cohort (sessionize_30m) legs. Final r8 headline
additions: derivatives_by_tag += szn (seasonal hour-of-day z-score —
a sixth leg: one more (tag,hod)-moments agg + broadcast filter), and
dedup_clusters gained the quality-aware keep-best leg (adds the
quality-score scan + a cluster-partitioned window; the iterative
components run is SHARED between the minid and best legs via
lsh_components, so the column covers two selection rules for roughly
one clustering). Non-headline: sim_quantize_int8 += tvec
(feature-hashed text vectors), join_revenue_by_region += dq
(data-quality metrics), dedup_ngram_jaccard += contain (directed
containment).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseries_db_spark.session import get_spark
from timeseries_db_spark import registry

HEADLINE = [
    # reference surface: scan/filter/agg/group/sort/limit shapes
    # (r2 note: families folded into union entries for the 50-entry gate
    # budget — agg_scalar_all covers r1's agg_sum et al., agg_by_tag_all
    # covers agg_avg_by_tag, range_scan_9combos covers range_ge_lt +
    # collect_all, li_by_tag covers li_sum/avg_by_tag)
    "agg_scalar_all",          # full-scan scalar aggs (onlyAgg fast path ×5)
    "agg_by_tag_all",          # range filter + low-card group ×5
    "agg_by_ts",               # range filter + high-card group (shuffle-heavy ×2)
    "collect_sort_limit",      # top-k both directions (TakeOrderedAndProject)
    "range_scan_9combos",      # pushed-down range scans, raw rows ×9
    "li_by_tag",               # 10× bigger table, (filter +) group-by ×2
    # north-star pipeline operators
    "join_revenue_by_nation",  # 3-way join, broadcast dims
    "asof_hourly_enrich",      # as-of join (union+window)
    "gapfill_hourly",          # generated grid + as-of forward fill
    "running_totals_by_tag",   # skew-safe two-pass window
    "dedup_minhash_lsh",       # shingle→minhash→band→bucket-join
    "dedup_clusters",          # r6: LSH pairs → connected components (iterative)
    "dedup_simhash",           # 60-bit simhash sigs + banded Hamming join (r7 fold: = r6's dedup_simhash_pairs + the sig rows of dedup_simhash_sig)
    "text_features",           # one-scan per-doc feature extraction (r1/r2-early: text_quality_score, a subset of this work)
    "text_vocab_topn",         # explode + map-side-combine agg + TakeOrdered
    "derivatives_by_tag",      # lag window + min_by/max_by rate agg
    "corpus_contamination",    # broadcast benchmark-shingle join
    "sim_cosine_topk",         # exact cosine top-k (sharded corpus, Arrow UDF)
    "ann_topk_ivf",            # IVF inverted-list ANN (bounded quantizer)
]

N_RUNS = 3  # best + median over 3: the box has ±40% neighbor noise

# r10 noise verdict (VERDICT r9 item 4): text_vocab_topn's +27-36%
# r8→r9 drift was profiled with a controlled same-session A/B — the r8
# tree (commit 10ac3d4) in a scratch worktree vs the current tree,
# back-to-back on one box, 5 warm runs each at sf0.1: r8 best 1.645s,
# current best 1.213s. The CURRENT code is ~26% faster than r8 on this
# entry (no work was added in r9; a71b1d8's two-pass cut is real), so
# the recorded drift was the box's documented ±40% cross-session noise.
# Leg decomposition at sf0.1 (warm): token_counts ~0.05s (cached),
# vocab ~0.19s, bm25 ~0.45s, cms ~0.48s.

# r11 noise verdict (VERDICT r10 item 2): sim_cosine_topk's +37%
# r9→r10 median drift (0.33→0.45s) with zero code change to the entry
# got the controlled same-box A/B (r9 tree at 5df2126^ in a scratch
# worktree vs current, interleaved runs, 6 warm runs each at sf0.1):
# r9 bests 0.470/0.561s vs current 0.537/0.558s, medians 0.561/0.648
# vs 0.606/0.661 — deltas ≤ ~10%, ordering FLIPS between interleaved
# rounds, and both trees now measure well above the recorded r10
# median. Verdict: box noise (the host was simply faster when r9's
# number was recorded); no regression attributable to code.

# r12 noise verdict (VERDICT r11 item 1): join_revenue_by_nation's
# +47% best / +90% median r10→r11 drift (1.32→1.94s best, median 3.36)
# with zero code change got the controlled same-box A/B (r10 tree at
# 8a2f4b7 in a scratch worktree vs current, interleaved serialized
# rounds, 3 spawns × 3 warm runs each at sf0.1): current bests
# 1.489/1.546/1.585 vs r10 bests 1.350/1.367/1.629; medians
# 1.559/1.572/1.594 vs 1.743/1.586/1.656. Deltas ≤ ~12%, ordering
# FLIPS between interleaved rounds, and BOTH trees measure far below
# the recorded r11 column (best 1.94 / median 3.36). Verdict: box
# noise — the host was loaded when BENCH_r11 was recorded; no
# regression attributable to code. (The ov_cnt/ov_ms legs already
# share one persisted session-window frame inside the entry —
# registry_ext.join_family's _persist_tracked("join_ov_win") — so the
# leg-wall attribution charging the first materialization to ov_cnt
# is an instrument artifact, not a duplicated window pass.)

# r12 legs: ann_topk_ivf += ivfp8 (the PRUNED IVF-PQ shape: |Q| = 8
# scale-pinned queries, nprobe = 2 ≪ nlist = 128 → ~87% of the corpus
# pruned before PQ work at both sf0.01 and sf0.1 — the prune is now
# CORRECTNESS-gate-visible, not just slope-visible), so its r12 column
# covers strictly more work than r11's same-named column (one extra
# probed-sublist encode + small ADC; late-r12 fold: the ivf/ivfpq/
# ivfp8 legs now SHARE one persisted centroid sample and one persisted
# corpus assignment via ann_topk_ivfpq's centroid_source/assign_source
# params — identical values, deduped plan, ~5% at sf0.01 where job
# overhead dominates and proportionally more at larger corpora).
# Non-headline r12 legs (text_pii_scrub's warc transport×charset
# matrix, RFC-3986 url shapes + SURT, wet/wat container views, pdf
# extraction, robots admission, c4 cleaning, cdx index parse;
# stream_ingest_dedup's cwarc streaming-WARC chain;
# multimodal_audio_chunks' fpcm FLAC decode + ometa Ogg/Opus) don't
# touch the headline list.

# r15 legs: ann_topk_ivf += ivfr (the EXACT-RERANK refine stage: one
# shared depth-3k IVF-PQ shortlist now serves BOTH the ivfpq leg — its
# global top-k is the ranked prefix — and the true-vector re-score),
# so its r15 column covers strictly more work than r14's same-named
# column (~+1.2 s at sf0.01 where the extra window/join overhead
# dominates; the depth-3k ADC replaces the old depth-k one). The other
# r15 legs (corpus_tokenize: unfmt/lgfmt avro shapes + snappy shards;
# text_pii_scrub: pdfq dirty-PDF quarantine; multimodal_resize_plan:
# imgq dirty-image quarantine; stream_ingest_dedup: cavr/cavj avro
# drops + ccsv/ccsj csv shards) don't touch the headline list.

# r13 legs: no headline entry gained legs this round — the r13
# additions all land on NON-headline entries (text_pii_scrub: werr
# dirty-WARC quarantine leg + mce main-content-extraction leg, and its
# pdf leg now cycles LZWDecode every 5th doc / PDF-1.5 xref-stream+
# ObjStm layout every 7th; multimodal_audio_chunks: otag OpusTags leg,
# and mmeta's duration derives from Xing/VBRI frame counts for
# doc_id%5<=2; stream_ingest_dedup's cwarc fixture is now DIRTY — a
# 404 per doc + a corrupt record per 6th doc — with quarantine=True
# landing a dead-letter table the new cwrej leg value-checks) — so r13
# headline columns measure the same logical work as r12. The header
# also gained load_1m/ncpu/n_runs/noise_pct fields
# (VERDICT r12 item 3): read those before calling any drift a
# regression.

# r11 legs: none of the headline entries gained legs this round (the
# r11 additions — msadpcm/aiff/fmeta/mmeta on multimodal_audio_chunks,
# ganim/exif on multimodal_resize_plan, html/url/warc on
# text_pii_scrub, the MP4 vframe container split and the LZW/predictor
# tresize variants — all land on NON-headline entries), so r11 headline
# columns measure the same logical work as r10. The slope table gained
# ann_topk_ivfpq / ann_topk_pq (pruning-real shape, see SLOPE_EXTRA),
# and BENCH_DETAIL.json gained queries_leg_wall per-leg attribution.

# r10 legs added to headline entries: ann_topk_ivf += pqr (the
# integer-refined PQ codebook leg: one more bounded driver refinement
# — 64-vector sample, 2 Lloyd rounds in int64 — plus a second fused
# encode+ADC corpus pass) += ivfpq (the full IVF-PQ composition:
# one more corpus assignment pass + probed-sublist encode + candidate-
# pair ADC), so its r10 column covers strictly more work than r9's
# same-named column (measured warm sf0.1: 1.12 r9 → 1.45 +pqr → 2.6 +ivfpq; at this SF
# all 128 lists are probed by the 50-query gate shape, so the ivfpq
# leg pays a full-corpus assignment+encode — at real scale nprobe/nlist
# prunes, which is the point of the composition).
# Non-headline r10 legs (text_lm_score approx, dml_roundtrip tsx,
# multimodal vframe/gresize, audio g711) don't touch the headline list.

# r9 legs added to headline entries: derivatives_by_tag += ewma (dyadic
# alpha=1/2 exponential smoothing — one more per-tag window with a
# bounded 40-row frame + a JVM fold), and ann_topk_ivf += pq (product-
# quantization ADC top-k — codebook collect + map-only integer encode +
# table-lookup ADC with per-shard top-k), so its r9 column covers
# strictly more work than r8's same-named column.

# --- scaling slope (r9, VERDICT r8 item 7): testdata tops out at sf0.1,
# so the 100 TB posture rested on plan shape alone. The bench now ALSO
# runs the heaviest events/documents entries at two synthetic scales
# (sources/synth.py — scale-invariant distributions) 10x apart and
# reports sec-per-row slope: slope = (t_big / t_small) / size_ratio,
# 1.0 = perfectly linear, >1 superlinear. Noise discipline: best-of-2
# per scale, small scale first (shared persist-tracked family caches
# build per input path, so scales never thrash each other's caches).
# Disable with SPARK_GRAFT_SLOPE=0 for quick local iterations. ---
SLOPE_ENTRIES = [
    "dedup_clusters",     # LSH pairs → iterative components (docs)
    "dedup_simhash",      # banded Hamming self-join (docs)
    "derivatives_by_tag", # window/moments family incl. ewma (events)
    "asof_hourly_enrich", # union+window as-of, both strategies (events)
    "sessionize_30m",     # session windows + funnel + cohort (events)
    "text_features",      # one-scan Arrow text kernels (docs)
]
SLOPE_SMALL = (100_000, 5_000)  # (events, documents) ≈ sf0.1
SLOPE_RATIO = 10
SLOPE_RUNS = 2

# r16 (VERDICT r15 item 4): min-of-2 proved too noisy for
# CHECKPOINTED/iterative operators — dedup_clusters' anchor slope
# swung 0.269→0.484 across two anchors on diff-verified-untouched
# code (checkpoint I/O sensitivity: each iteration writes and
# re-reads materialized state, so one slow-disk moment pollutes a
# whole run, and with 2 runs the min still carries it). Entries named
# here run 3 times per scale and report the MEDIAN — robust to one
# outlier run in either direction. Stable single-pass shapes keep
# min-of-2 (their noise is neighbor load, which min removes best).
SLOPE_MEDIAN3 = {"dedup_clusters", "corpus_ingest_stream"}


# r10 (VERDICT r9 item 6): two named superlinear RISKS join the slope
# table as direct operator callables (their gate entries need TPC-H
# tables / scratch dirs the synthetic fixture doesn't provide):
# - interval_overlap: the bucket-explode overlap join — denser events
#   over the FIXED 30-day window merge 30-minute sessions into longer
#   ones, so buckets-per-session GROWS with scale; this is the one plan
#   r8's verdict called a superlinear candidate.
# - corpus_ingest_stream: the streaming near-dup ingest — the second
#   batch's seen-signature anti-join grows with published history.
#   Timing includes the full 2-micro-batch streaming run (scratch dirs
#   under /tmp, mtimes pinned via os.utime — no sleeps); its constant
#   streaming overhead (~5s query startup) makes the measured slope an
#   UPPER-bounded-by-reality, slightly deflated figure — SCALE.md notes
#   the decomposition.
def _slope_interval_overlap(spark, d: str):
    from timeseries_db_spark.operators.joins import session_window_overlap
    from timeseries_db_spark.sources.synth import EVENTS_SPAN_MS, EVENTS_T0_MS

    return session_window_overlap(
        spark, d, lo=EVENTS_T0_MS, hi=EVENTS_T0_MS + EVENTS_SPAN_MS - 1
    )


def _slope_corpus_ingest(spark, d: str):
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from timeseries_db_spark.streaming import corpus_ingest as ci

    base = tempfile.mkdtemp(prefix="tsdb_slope_ci_")
    docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
        "doc_id", "text"
    )
    hi = docs.agg({"doc_id": "max"}).first()[0] + 1
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    for i, (lo, hh) in enumerate([(0, hi // 2), (hi // 2, hi)]):
        pdf = (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hh))
            .toPandas()
            .sort_values("doc_id")
        )
        path = os.path.join(in_dir, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = os.path.join(base, "out")
    query = ci.start_corpus_ingest(
        ci.read_docs_stream(spark, in_dir, max_files_per_trigger=1),
        out_dir,
        os.path.join(base, "ckpt"),
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return ci.read_published(spark, out_dir).select("doc_id", "fp53")


# r11 (VERDICT r10 item 1): the ANN family joins the slope table at a
# PRUNING-REAL shape. The 50-query gate shape probes all 128 lists
# (50 queries × 4 probes reach every list at sf0.01/0.1), so the gate
# column measures the degenerate full-probe path and a regression in
# the IN-pushdown list prune (similarity.py ann_topk_ivfpq's
# isin(needed_ids) before any PQ work) would be invisible. Here
# |Q| = 8 queries × nprobe = 4 probes ≤ 32 of nlist = 128 lists →
# ≥ 75% of the corpus is pruned BEFORE the PQ encode, at BOTH scales
# (the synth embeddings are cluster-structured with a scale-invariant
# cluster count, so the pruned fraction holds as N grows). ann_topk_pq
# rides alongside as the unpruned full-scan ADC reference: the ivfpq
# slope ≤ the pq slope bounds what the prune buys at 10×.
def _slope_ann_ivfpq(spark, d: str):
    from timeseries_db_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    return sim.ann_topk_ivfpq(
        spark, emb.filter("vec_id < 8"), emb, 10, nlist=128, nprobe=4
    )


def _slope_ann_pq(spark, d: str):
    from timeseries_db_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    return sim.ann_topk_pq(spark, emb.filter("vec_id < 8"), emb, 10)


# r15: the arrival-format decode surface joins the slope table — the
# from-spec Avro walk (snappy blocks) over shards built from the
# synthetic documents. The shard build is cached under the fixture dir
# (first run pays it, min-of-runs measures the read), so the slope is
# the DECODER's: binaryFile scan → per-block snappy inflate + CRC →
# record decode → one tiny agg. Linear by construction (per-file
# map-only); the row pins that it stays so.
def _slope_avro_ingest(spark, d: str):
    from pyspark.sql import functions as F

    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.sources.tables import read_corpus_any

    av_dir = os.path.join(d, "avro_shards")
    done = os.path.join(av_dir, "_done")
    if not os.path.exists(done):
        os.makedirs(av_dir, exist_ok=True)
        pdf = (
            spark.read.parquet(os.path.join(d, "documents.parquet"))
            .select("doc_id", "text")
            .toPandas()
        )
        ch = 10_000
        for k in range(0, len(pdf), ch):
            recs = [
                {"doc_id": int(r.doc_id), "text": r.text}
                for r in pdf.iloc[k : k + ch].itertuples()
            ]
            with open(os.path.join(av_dir, f"p{k}.avro"), "wb") as f:
                f.write(
                    AV.avro_build(
                        recs,
                        AV.CORPUS_AVRO_SCHEMA,
                        codec="snappy",
                        block_records=500,
                    )
                )
        open(done, "w").close()
    return (
        read_corpus_any(spark, av_dir, fmt="avro")
        .filter("_corrupt IS NULL")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("text")).alias("chars"),
        )
    )


SLOPE_EXTRA = {
    "interval_overlap": _slope_interval_overlap,
    "corpus_ingest_stream": _slope_corpus_ingest,
    "ann_topk_ivfpq": _slope_ann_ivfpq,
    "ann_topk_pq": _slope_ann_pq,
    "avro_ingest": _slope_avro_ingest,
}


def run_slope(spark, queries) -> dict:
    import tempfile

    from timeseries_db_spark.sources.synth import materialize_fixture

    base = os.path.join(tempfile.gettempdir(), "tsdb_slope")
    dirs, sizes = {}, {}
    for scale in (1, SLOPE_RATIO):
        n_e, n_d = SLOPE_SMALL[0] * scale, SLOPE_SMALL[1] * scale
        dirs[scale] = materialize_fixture(spark, base, n_e, n_d)
        sizes[scale] = {"events": n_e, "documents": n_d}
    fns = {name: queries[name] for name in SLOPE_ENTRIES}
    fns.update(SLOPE_EXTRA)
    secs: dict[int, dict[str, float]] = {1: {}, SLOPE_RATIO: {}}
    for scale in (1, SLOPE_RATIO):  # scales outer: cache-sharing order
        for name, fn in fns.items():
            # SLOPE_MEDIAN3 note (ADVICE r17): for dedup_clusters the
            # persist-tracked minhash signature/pair caches are
            # intentionally shared across the median-of-3 runs — runs
            # 2-3 re-time only the iterative components loop, which is
            # exactly the quantity the slope instrument tracks.
            n_runs = 3 if name in SLOPE_MEDIAN3 else SLOPE_RUNS
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, dirs[scale]).toPandas()
                runs.append(time.perf_counter() - t0)
            runs.sort()
            # median-of-3 for checkpointed/iterative entries (see
            # SLOPE_MEDIAN3), min otherwise
            agg = runs[len(runs) // 2] if name in SLOPE_MEDIAN3 else runs[0]
            secs[scale][name] = round(agg, 4)
    out = {"size_ratio": SLOPE_RATIO, "sizes": sizes, "entries": {}}
    for name in fns:
        s, b = secs[1][name], secs[SLOPE_RATIO][name]
        out["entries"][name] = {
            "sec_small": s,
            "sec_big": b,
            "factor": round(b / s, 3),
            "slope": round(b / s / SLOPE_RATIO, 3),
            "agg": "median3" if name in SLOPE_MEDIAN3 else "min2",
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # r13 (VERDICT r12 item 3): the box runs other workloads and two
    # consecutive rounds paid a controlled interleaved A/B to adjudicate
    # drift that turned out to be load both times. Record the load
    # average around the run so the artifact carries the evidence for
    # free: a 1-min loadavg well above ncpu at either end says "busy
    # box" without an A/B. (getloadavg counts runnable threads
    # machine-wide; this JVM alone contributes up to local[N] of it
    # WHILE queries run, so the START figure — taken before the session
    # spins up — is the cleanest neighbor-load signal.)
    load_start = tuple(round(x, 2) for x in os.getloadavg())
    ncpu = os.cpu_count() or 0

    spark = get_spark("tsdb-bench")
    queries, _ = registry.build_registry()

    # warmup: JVM + whole-stage codegen + parquet footer caches
    queries["collect_sort_limit"](spark, sf_dir).toPandas()

    missing = [n for n in HEADLINE if n not in queries]
    assert not missing, f"HEADLINE out of sync with the registry: {missing}"

    # best-of-N per query: this box runs other workloads (load spikes of
    # ±40% observed between identical runs); the min measures the engine
    # rather than the neighbors. Median-of-N reported alongside.
    # r8 (VERDICT r7 item 6): first_run is reported separately — it is
    # the COLD number for persist-tracked families (cache build included)
    # and the shape the driver's one-shot gate actually pays, while
    # best/median of the remaining runs measure the warm engine. Fold
    # mappings in the header compare against first_run.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    firsts: dict[str, float] = {}
    leg_wall: dict[str, dict[str, float]] = {}
    want_legs = os.environ.get("SPARK_GRAFT_LEGWALL", "1") != "0"
    from timeseries_db_spark import debug as dbg

    for name in HEADLINE:
        runs = []
        pdf = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            pdf = queries[name](spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
        firsts[name] = round(runs[0], 4)
        timings[name] = round(min(runs), 4)
        medians[name] = round(sorted(runs)[len(runs) // 2], 4)
        # r11 (VERDICT r10 item 7): per-leg attribution for union-folded
        # entries — one warm run per leg with a literal filter on the
        # discriminator (Catalyst folds lit(kind)='x' to false on the
        # other branches, pruning them from the executed plan), so a leg
        # addition reads as ITS OWN column in BENCH_DETAIL.json instead
        # of an unexplained regression of the folded total. Caveat: the
        # callable still pays every leg's DRIVER-side bounded collects
        # (codebooks, probe sets) at plan-build time, so leg walls sum
        # above the folded column; deltas between legs isolate the
        # executed-plan differences.
        col = dbg.leg_column(set(pdf.columns)) if want_legs else None
        if col is not None:
            vals = sorted(str(v) for v in pdf[col].dropna().unique())
            if len(vals) >= 2:
                per = {}
                for v in vals:
                    t0 = time.perf_counter()
                    queries[name](spark, sf_dir).filter(
                        f"{col} = '{v}'"
                    ).toPandas()
                    per[v] = round(time.perf_counter() - t0, 4)
                leg_wall[name] = per

    load_headline_end = tuple(round(x, 2) for x in os.getloadavg())

    slope = None
    if os.environ.get("SPARK_GRAFT_SLOPE", "1") != "0":
        slope = run_slope(spark, queries)
    load_end = tuple(round(x, 2) for x in os.getloadavg())

    # r10 (VERDICT r9 item 1): the driver records only the LAST 2000
    # chars of stdout; r9's single line (headline + full slope detail)
    # outgrew that and BENCH_r09.json landed with parsed:null. The
    # contract is ONE compact JSON line, so the bulky sections
    # (per-query medians/firsts, full slope detail) move to a side file
    # and only compact scalars + a name→slope map stay inline. A hard
    # length assert keeps future additions from silently re-breaking
    # the artifact.
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "total_median": round(sum(medians.values()), 4),
        "total_first_run": round(sum(firsts.values()), 4),
        "sf": sf,
        "detail_file": "BENCH_DETAIL_run.json",
        # self-diagnosing noise fields (r13): start is pre-session
        # neighbor load; noise_pct is the median-over-best spread of
        # this very run — large values say "read BENCH_DETAIL/loads
        # before calling a regression".
        "load_1m": {"start": load_start[0], "end": load_end[0]},
        "ncpu": ncpu,
        "n_runs": N_RUNS,
        "noise_pct": round(
            (sum(medians.values()) / total - 1.0) * 100, 1
        ) if total else 0.0,
    }
    if slope is not None:
        out["slopes"] = {
            name: rec["slope"] for name, rec in slope["entries"].items()
        }
    detail = {
        "queries_median": medians,
        "queries_first_run": firsts,
        "queries_leg_wall": leg_wall,
        "slope": slope,
        "loadavg": {
            "start": load_start,
            "after_headline": load_headline_end,
            "end": load_end,
            "ncpu": ncpu,
        },
    }
    # r14 (VERDICT item 5): run detail goes to an UNCOMMITTED path —
    # the committed BENCH_DETAIL.json is the quiet-box ANCHOR detail
    # that BENCH_ANCHOR_r13.json references, and r13's bench overwrote
    # it on every run (every session had to remember `git restore`).
    # Refreshing the anchor is now a deliberate copy (or
    # SPARK_GRAFT_DETAIL=BENCH_DETAIL.json), never a side effect.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.environ.get("SPARK_GRAFT_DETAIL", "BENCH_DETAIL_run.json"),
    )
    with open(detail_path, "w") as f:
        json.dump({**out, **detail}, f, indent=1)
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"bench stdout line is {len(line)} chars; the driver tail-captures "
        "2000 — move whatever grew into BENCH_DETAIL.json"
    )
    print(line)


if __name__ == "__main__":
    main()
