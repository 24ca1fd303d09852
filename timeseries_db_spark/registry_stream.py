"""Structured-Streaming gate entries: the stateful operators run as real
micro-batch streaming queries inside a ``(spark, sf_dir) -> DataFrame``
callable, and their emitted output is compared against the SAME DuckDB
oracles as their batch twins — replacing pytest-only evidence with driver
CORRECTNESS rows.

Determinism design (what makes a streaming run oracle-comparable):

* ``stream_running_totals`` — the whole fixture arrives as ONE file →
  one micro-batch; the fold sorts the full batch by event time, so the
  cumulative equals the batch window twin exactly
  (``streaming/stateful.py`` ordering contract). Multi-batch and
  multi-Arrow-chunk arrival stay covered by ``tests/test_stateful.py``.
* ``stream_sessions`` — watermark-final semantics: the data batch b0 is
  followed by two sentinel batches per tag, far enough ahead that the
  watermark after b1 passes every b0 session's ``end + gap``. During b2
  every b0 session is watermark-final and emits; the sentinel sessions
  themselves stay open (b2 lands within ``gap`` of b1, and no later
  batch finalizes them), so the emitted set is EXACTLY the batch
  sessionization of b0 — the closed-form oracle below.

Fixture values are small integers, so double accumulation is exact and
engine-independent.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseries_db_spark.operators.analytics import running_totals_sql
from timeseries_db_spark.sources.fixture import (
    timeseries_fixture,
    timeseries_fixture_sql,
)
from timeseries_db_spark.streaming.stateful import (
    running_totals_stream,
    sessionize_stream,
)

_SINK_IDS = itertools.count()

RT_N = 20_000

SESS_BASE = 1_704_067_200_000  # 2024-01-01 UTC
SESS_N = 2_000
SESS_MINUTE = 60_000
SESS_GAP_MS = 5 * SESS_MINUTE
#: every 10th per-tag event jumps by more than the gap → 10-event sessions
SESS_SKIP_MS = 31 * SESS_MINUTE
SESS_TAGS = ("Munich", "Skopje", "London", "Athens")


def _scratch(kind: str) -> str:
    path = os.path.join(tempfile.gettempdir(), f"tsdb_{kind}_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


#: State-store parallelism for the bounded gate runs. A streaming query
#: fixes its state partition count from `spark.sql.shuffle.partitions`
#: at first start — under the driver's vanilla session that default is
#: 200, i.e. 200 state-store tasks per micro-batch for a 4-tag fixture
#: (measured 58 s for the 3-batch session run; ~6× faster pinned at 8).
STREAM_SHUFFLE_PARTITIONS = "8"


def _run_to_memory(plan: DataFrame, ckpt: str) -> DataFrame:
    spark = plan.sparkSession
    name = f"stream_gate_{os.getpid()}_{next(_SINK_IDS)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            plan.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tag cumulative count/sum via ``applyInPandasWithState`` over a
    real file-source micro-batch run; oracle = the batch window-function
    SQL (``operators/analytics.py``)."""
    base = _scratch("stream_rt")
    in_dir = os.path.join(base, "in")
    # one sorted file → one micro-batch → arrival order == event order
    timeseries_fixture(spark, RT_N).repartition(1).sortWithinPartitions(
        "timestamp"
    ).write.parquet(in_dir)
    stream = spark.readStream.schema(
        "timestamp long, tag string, value double"
    ).parquet(in_dir)
    return _run_to_memory(
        running_totals_stream(stream), os.path.join(base, "ckpt")
    )


def stream_running_totals_sql() -> str:
    return running_totals_sql(timeseries_fixture_sql(RT_N))


def _sess_case(expr: str) -> str:
    return (
        f"CASE WHEN {expr} % 4 = 0 THEN 'Munich' "
        f"WHEN {expr} % 4 = 1 THEN 'Skopje' "
        f"WHEN {expr} % 4 = 2 THEN 'London' "
        f"ELSE 'Athens' END"
    )


def _sess_events(spark: SparkSession) -> DataFrame:
    """Gappy per-tag events: tag = i%4, per-tag index j = i div 4,
    ts = BASE + j*minute + (j div 10)*skip → sessions of 10 events."""
    i = F.col("id")
    j = (i - i % 4) / 4  # exact: i ≥ 0
    j = j.cast("long")
    ts = (
        F.lit(SESS_BASE)
        + j * SESS_MINUTE
        + ((j - j % 10) / 10).cast("long") * SESS_SKIP_MS
    )
    return spark.range(SESS_N).select(
        ts.alias("timestamp"),
        F.expr(_sess_case("id")).alias("tag"),
        (1 + i % 7).cast("double").alias("value"),
    )


def _sess_events_sql() -> str:
    return f"""
        SELECT {SESS_BASE} + (i // 4) * {SESS_MINUTE}
                 + ((i // 4) // 10) * {SESS_SKIP_MS} AS "timestamp",
               {_sess_case("i")} AS tag,
               CAST(1 + i % 7 AS DOUBLE) AS value
        FROM range({SESS_N}) r(i)
    """


def _write_sess_file(path: str, pdf: pd.DataFrame) -> None:
    pdf = pdf.copy()
    # microsecond precision: pandas' default ns would write
    # TIMESTAMP(NANOS), which Spark won't read as TimestampType
    pdf["event_time"] = pd.to_datetime(pdf["timestamp"], unit="ms").astype(
        "datetime64[us]"
    )
    pq.write_table(pa.Table.from_pandas(pdf), path)


def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-finalized gap sessionization as a 3-micro-batch
    streaming run (data, watermark-advancing sentinels, flush sentinels);
    emits exactly the batch sessions of the data batch (see module
    docstring for why the sentinel sessions never emit)."""
    base = _scratch("stream_sess")
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    pdf = (
        _sess_events(spark)
        .toPandas()
        .sort_values(["timestamp", "tag"])
        .reset_index(drop=True)
    )
    max_b0 = int(pdf["timestamp"].max())
    s1 = max_b0 + 10 * SESS_GAP_MS  # new session per tag, far future
    s2 = s1 + 1_000  # merges into the s1 session → stays open
    # r17: distinct mtimes are PINNED (os.utime) instead of slept for —
    # same deterministic batch order, zero wall time (the bench slope
    # fixture's pattern)
    _write_sess_file(os.path.join(in_dir, "b0.parquet"), pdf)
    _write_sess_file(
        os.path.join(in_dir, "b1.parquet"),
        pd.DataFrame(
            {"timestamp": [s1] * 4, "tag": list(SESS_TAGS), "value": [1.0] * 4}
        ),
    )
    _write_sess_file(
        os.path.join(in_dir, "b2.parquet"),
        pd.DataFrame(
            {"timestamp": [s2] * 4, "tag": list(SESS_TAGS), "value": [1.0] * 4}
        ),
    )
    for _i, _b in enumerate(("b0", "b1", "b2")):
        _t = 1_700_000_000 + _i
        os.utime(os.path.join(in_dir, f"{_b}.parquet"), (_t, _t))
    stream = (
        spark.readStream.schema(
            "timestamp long, tag string, value double, event_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .withWatermark("event_time", "1 minute")
    )
    return _run_to_memory(
        sessionize_stream(stream, gap_ms=SESS_GAP_MS), os.path.join(base, "ckpt")
    )


def stream_sessions_sql() -> str:
    """Batch gap-sessionization of the b0 data, closed form."""
    return f"""
        WITH ev AS ({_sess_events_sql()}),
        gaps AS (
            SELECT tag, "timestamp", value,
                   CASE WHEN lag("timestamp") OVER w IS NULL
                             OR "timestamp" - lag("timestamp") OVER w > {SESS_GAP_MS}
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
            WINDOW w AS (PARTITION BY tag ORDER BY "timestamp")
        ),
        sids AS (
            SELECT tag, "timestamp", value,
                   sum(new_session) OVER (
                       PARTITION BY tag ORDER BY "timestamp"
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM gaps
        )
        SELECT tag, min("timestamp") AS session_start,
               max("timestamp") AS session_end,
               count(*) AS n,
               round(sum(value), 4) AS total
        FROM sids GROUP BY tag, sid
    """


# --- streaming INGEST path (r7, VERDICT item 3): the reference's W1 at
# scale — readStream → watermark dedup → foreachBatch insert-if-absent
# MERGE into a TsTable (streaming/ingest.py:99). Determinism: batch b1
# re-sends b0 keys with a poison value (999) that must NEVER land —
# whichever dedup layer drops them (watermark state or the table
# anti-join), the final table is b0 ∪ b1's new keys with the original
# value formula, which the oracle states closed-form. Within-b0
# duplicate rows carry identical values, so layer-1 state dedup is
# value-neutral and the run is bit-deterministic.
ING_BASE = 1_704_067_200_000
ING_N0 = 1_200  # batch-0 unique keys (ts = BASE + i*1000)
ING_DUP0 = 100  # within-b0 duplicate copies (same value → deterministic)
ING_RESEND = 300  # b1 re-sends of b0 keys, poison value — must be dropped
ING_NEW = 300  # b1 genuinely new keys → inserted


def _ing_pdf(lo: int, hi: int, poison: bool = False) -> pd.DataFrame:
    i = pd.Series(range(lo, hi), dtype="int64")
    return pd.DataFrame(
        {
            "timestamp": ING_BASE + i * 1_000,
            "tag": [SESS_TAGS[k % 4] for k in range(lo, hi)],
            "value": 999.0 if poison else (1 + i % 7).astype("float64"),
        }
    )


# --- r9 sasof leg (VERDICT r8 item 1): the streaming AS-OF enrichment
# (streaming/joins.py) was the largest pytest-only operator. Events
# arrive in two micro-batches and each batch as-of joins a STATIC
# reference TsTable holding per-tag rates only at every-3rd hour, so the
# join must look BACK past 0-2 hourly buckets — the oracle states the
# enriched value closed-form. (Reference updates mid-stream and replay
# pinning stay pytest territory: test_streaming.py.)
SASOF_N = 400
SASOF_STEP_MS = 200_000  # 400 events span ~22.2h of the 24h rate table
SASOF_HOUR_MS = 3_600_000


def _sasof_leg(spark: SparkSession, base: str) -> DataFrame:
    """Run the 2-batch streaming as-of enrich; returns rows coerced to
    the entry schema as (event ts, 'sasof', ref_value)."""
    from timeseries_db_spark.operators.dml import TsTable
    from timeseries_db_spark.streaming.joins import start_asof_enrich

    # rate(h, t) = 1 + 10h + t at hours h ∈ {0, 3, ..., 24} per tag
    ref_rows = pd.DataFrame(
        [
            (ING_BASE + h * SASOF_HOUR_MS, SESS_TAGS[t], float(1 + 10 * h + t))
            for h in range(0, 25, 3)
            for t in range(4)
        ],
        columns=["timestamp", "tag", "value"],
    )
    ref = TsTable.create(
        spark, os.path.join(base, "sasof_ref"), spark.createDataFrame(ref_rows)
    )
    i = pd.Series(range(SASOF_N), dtype="int64")
    ev = pd.DataFrame(
        {
            "timestamp": ING_BASE + i * SASOF_STEP_MS,
            "tag": [SESS_TAGS[k % 4] for k in range(SASOF_N)],
            "value": (1 + i % 7).astype("float64"),
        }
    )
    in_dir = os.path.join(base, "sasof_in")
    os.makedirs(in_dir)
    half = SASOF_N // 2
    for i, (name, pdf) in enumerate(
        (("b0", ev.iloc[:half]), ("b1", ev.iloc[half:]))
    ):
        path = os.path.join(in_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        # distinct mtimes PINNED, not slept for (r17)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("timestamp long, tag string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    out_dir = os.path.join(base, "sasof_out")
    query = start_asof_enrich(
        stream, ref, out_dir, os.path.join(base, "sasof_ckpt")
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.read.parquet(out_dir).select(
        "timestamp",
        F.lit("sasof").alias("tag"),
        F.col("ref_value").alias("value"),
    )


# r16 sivf leg: streaming IVF index MAINTENANCE — arrivals assigned
# to the FROZEN coarse quantizer incrementally (map-only broadcast
# assignment, streaming/ivf_maintain.py) instead of re-clustering.
# Arrivals here are the corpus vectors with vec_id % 7 == 3 re-keyed
# +1_000_000 (so the oracle restates them from the embeddings view),
# split over two shards; the assignment rule is the engine-
# reproducible rounded-cosine rule the batch IVF entry already pins,
# and the per-list growth counts (the re-cluster trigger signal)
# ride as a second tag.
def _sivf_leg(spark: SparkSession, sf_dir: str, base: str) -> DataFrame:
    from timeseries_db_spark.operators.similarity import ivf_centroids
    from timeseries_db_spark.streaming import ivf_maintain as im

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    new_vecs = emb.filter("vec_id % 7 = 3").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    in_dir = os.path.join(base, "sivf_in")
    os.makedirs(in_dir)
    # the file stream source lists FILES — land each shard as one
    # flat parquet file (write to a scratch dir, move the part file)
    for k, pred in enumerate(("vec_id % 2 = 0", "vec_id % 2 = 1")):
        tmp = os.path.join(base, f"sivf_tmp{k}")
        new_vecs.filter(pred).coalesce(1).write.parquet(tmp)
        part = next(
            p for p in os.listdir(tmp) if p.endswith(".parquet")
        )
        os.rename(
            os.path.join(tmp, part), os.path.join(in_dir, f"s{k}.parquet")
        )
    out_dir = os.path.join(base, "sivf_out")
    query = im.start_ivf_assign_ingest(
        im.read_embedding_stream(spark, in_dir),
        ivf_centroids(emb),
        out_dir,
        os.path.join(base, "sivf_ckpt"),
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    assigned = im.read_assignments(spark, out_dir).select(
        F.col("vec_id").alias("timestamp"),
        F.lit("sivf").alias("tag"),
        F.col("list_id").cast("double").alias("value"),
    )
    growth = im.list_growth(spark, out_dir).select(
        F.col("list_id").alias("timestamp"),
        F.lit("sivg").alias("tag"),
        F.col("n_new").cast("double").alias("value"),
    )
    return assigned.unionByName(growth)


# r9 ssj leg: the stream-stream time-bounded inner join
# (streaming/joins.py:enrich_with_alerts) was the last streaming
# operator without a driver row. Both streams read the REAL events
# fixture (alerts = value > 90); inner-join rows emit as matched, so the
# drained result equals the batch theta join exactly — the closed-form
# oracle below. Tolerance matches the pytest (5 min, same tag).
SSJ_TOLERANCE_MS = 300_000


def _ssj_leg(spark: SparkSession, sf_dir: str, base: str) -> DataFrame:
    from timeseries_db_spark.streaming.ingest import read_events_stream

    glob = os.path.join(sf_dir, "events.parquet")
    events = read_events_stream(spark, glob)
    alerts = read_events_stream(spark, glob).filter("value > 90")
    from timeseries_db_spark.streaming.joins import enrich_with_alerts

    out = enrich_with_alerts(events, alerts)
    joined = _run_to_memory(out, os.path.join(base, "ssj_ckpt"))
    return joined.select(
        "timestamp",
        F.lit("ssj").alias("tag"),
        F.col("alert_ts").cast("double").alias("value"),
    )


def stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-micro-batch ingest run landing in a scratch TsTable; returns
    the final table snapshot. b0 = 1,200 keys + 100 same-value
    duplicates; b1 = 300 late re-sends (poison value, dropped) + 300 new
    keys. maxFilesPerTrigger=1 + distinct mtimes pin the batch order, so
    the b1 re-sends arrive when the table already holds their keys."""
    from timeseries_db_spark.operators.dml import TsTable
    from timeseries_db_spark.streaming.ingest import start_ingest

    base = _scratch("stream_ing")
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    b0 = pd.concat(
        [_ing_pdf(0, ING_N0), _ing_pdf(0, ING_DUP0)], ignore_index=True
    )
    b1 = pd.concat(
        [
            _ing_pdf(0, ING_RESEND, poison=True),
            _ing_pdf(ING_N0, ING_N0 + ING_NEW),
        ],
        ignore_index=True,
    )
    _write_sess_file(os.path.join(in_dir, "b0.parquet"), b0)
    _write_sess_file(os.path.join(in_dir, "b1.parquet"), b1)
    # distinct mtimes PINNED, not slept for (r17)
    os.utime(os.path.join(in_dir, "b0.parquet"), (1_700_000_000, 1_700_000_000))
    os.utime(os.path.join(in_dir, "b1.parquet"), (1_700_000_001, 1_700_000_001))
    stream = (
        spark.readStream.schema(
            "timestamp long, tag string, value double, event_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    table = TsTable.create(spark, os.path.join(base, "tbl"))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        query = start_ingest(
            stream, table, os.path.join(base, "ckpt"), watermark="5 minutes"
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        # r8 corpus leg: the same entry also runs the streaming CORPUS
        # ingest (near-dup suppression via the persisted signature
        # index) — tag 'cdoc' keeps the legs disjoint in the shared
        # (timestamp, tag, value) schema, and the published docs carry
        # their 53-bit content fingerprint as the value
        corpus = _corpus_ingest_leg(spark, sf_dir, base)
        # r9 sasof leg: the streaming as-of enrichment, tag 'sasof',
        # value = the joined reference rate (closed-form oracle)
        sasof = _sasof_leg(spark, base)
        # r9 ssj leg: stream-stream time-bounded join over the real
        # events fixture, tag 'ssj', value = the joined alert timestamp
        ssj = _ssj_leg(spark, sf_dir, base)
        # r16 sivf leg: streaming IVF index maintenance — incremental
        # assignment of arriving embedding shards to the frozen coarse
        # quantizer, tags 'sivf' (per-vector list assignment) and
        # 'sivg' (per-list growth counts, the re-cluster trigger)
        sivf = _sivf_leg(spark, sf_dir, base)
        # r12 cwarc leg: the full Common-Crawl pipeline as ONE
        # streaming query — WARC files (gzip members / chunked /
        # CE-gzip transports cycled by id) → HTTP decode → HTML→text →
        # near-dup suppression; tag 'cwarc', value = fp53 of the
        # published extracted text
        cwarc = _warc_ingest_leg(spark, sf_dir, base)
        # r14 carc leg (VERDICT item 4): ARCHIVES as the streaming
        # arrival unit — tar / zip-deflate / zip-stored shards cycled
        # by id, tolerant expansion → text-member routing → the same
        # near-dup suppression, with every 6th doc's archive POISONED
        # (corrupt tar header / corrupt member CRC): the published set
        # is unchanged and the damage lands in the dead-letter table
        # the carj leg reads back
        carc = _archive_ingest_leg(spark, sf_dir, base)
        # r16 mixed leg (VERDICT item 2): the r15 AVRO and CSV arrival
        # units CONSOLIDATED — one landing directory holding .avro
        # (deflate/snappy/null codecs, one block POISONED), .csv (one
        # type-broken line per shard) and, newly gate-pinned, .jsonl
        # shards (one broken line per shard), ingested by ONE
        # streaming query whose single shared micro-batch routes by
        # extension into per-format near-dup states. Published sets
        # and dead-letter counts are format-isolated, so the cavr/
        # cavj/ccsv/ccsj closed forms are unchanged and cjsl/cjsj
        # join them — six tag channels from one query where r15 spent
        # two queries and five micro-batches on four channels
        mixed = _mixed_ingest_leg(spark, sf_dir, base)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        table.read()
        .unionByName(corpus)
        .unionByName(sasof)
        .unionByName(ssj)
        .unionByName(sivf)
        .unionByName(cwarc)
        .unionByName(carc)
        .unionByName(mixed)
    )


def _corpus_ingest_leg(spark: SparkSession, sf_dir: str, base: str) -> DataFrame:
    """2-micro-batch streaming corpus ingest over the documents table
    (halves by doc_id, ascending mtimes pin arrival order to doc_id
    order — the published set is batch-boundary invariant but NOT
    arrival-order invariant; 3-batch and restart shapes are pytest
    territory). Returns (doc_id, 'cdoc', fp53)."""
    from timeseries_db_spark.streaming import corpus_ingest as ci

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    in_dir = os.path.join(base, "corpus_in")
    os.makedirs(in_dir)
    cuts = [(0, hi // 2), (hi // 2, hi)]
    for i, (lo, hh) in enumerate(cuts):
        pdf = (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hh))
            .toPandas()
            .sort_values("doc_id")
        )
        path = os.path.join(in_dir, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        # ascending mtimes PINNED, not slept for (r17)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = os.path.join(base, "corpus_out")
    query = ci.start_corpus_ingest(
        ci.read_docs_stream(spark, in_dir, max_files_per_trigger=1),
        out_dir,
        os.path.join(base, "corpus_ckpt"),
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return ci.read_published(spark, out_dir).select(
        F.col("doc_id").alias("timestamp"),
        F.lit("cdoc").alias("tag"),
        F.col("fp53").cast("double").alias("value"),
    )


#: cwarc leg's shared sanitize expression (Spark form; the oracle
#: restates it with DuckDB's 'g' flag) — the constructed page's
#: extraction closed form is 'Doc {id} {clean} &tail!'
_CWARC_CLEAN = (
    "trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', ''),"
    " ' +', ' '))"
)

#: the closed form of the WARC-extracted corpus the cwarc leg publishes
#: (doc_id stride: warcinfo is record 0, the response is record 1)
_CWARC_DOCS_SQL = """
    SELECT doc_id * 1000 + 1 AS doc_id,
           trim(regexp_replace('Doc ' || doc_id || ' ' ||
                trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                     ' +', ' ', 'g')) || ' &tail!', ' +', ' ', 'g')) AS text
    FROM documents
"""


def _warc_ingest_leg(spark: SparkSession, sf_dir: str, base: str) -> DataFrame:
    """2-micro-batch streaming WARC→corpus ingest (r12): per-doc WARC
    files built around HTML whose extraction is closed-form, transport
    layers cycled by doc_id (plain / gzip record members / chunked /
    gzip-then-chunked), halves by doc_id with pinned mtimes — the whole
    WARC→HTTP→HTML→text→near-dup chain runs as ONE streaming query
    (streaming/warc_ingest.py). Returns (doc_id, 'cwarc', fp53)."""
    from timeseries_db_spark.operators import warc as W
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import warc_ingest as wi

    pdf = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", F.expr(_CWARC_CLEAN).alias("clean"))
        .toPandas()
        .sort_values("doc_id")
    )
    hi = int(pdf["doc_id"].max()) + 1
    in_dir = os.path.join(base, "warc_in")
    os.makedirs(in_dir)
    halves = [pdf[pdf.doc_id < hi // 2], pdf[pdf.doc_id >= hi // 2]]
    for i, half in enumerate(halves):
        ids, payloads = [], []
        for did, clean in zip(half["doc_id"], half["clean"]):
            did = int(did)
            html = (
                "<html><head><script>var x=1;</script><style>p{}</style>"
                f"</head><body><!-- c --><h1>Doc {did}</h1><p>{clean}"
                " &nbsp;&amp;tail&#33;</p></body></html>"
            )
            t = did % 4
            block = W.http_response_block(
                html.encode("utf-8"),
                gzip_body=(t == 3),
                chunked=(t in (2, 3)),
            )
            uri = f"http://example{did % 7}.com/doc{did}"
            head = [
                ("warcinfo", "", b"software: tsdb\r\n"),
                ("response", uri, block),
            ]
            # r13: DIRTY segments under the gate — every doc also
            # ships a 404 page (record 2 after the good response),
            # and every 6th doc a structurally-corrupt record between
            # them (junk gzip member on the member-transport docs,
            # oversized Content-Length otherwise). The published set
            # must be unchanged; the rejects land in the dead-letter
            # table the cwrej leg reads back.
            nf = (
                "response",
                uri + "/missing",
                W.http_response_block(
                    f"<p>nope {did}</p>".encode(), status=404
                ),
            )
            poison = did % 6 == 0
            if t == 1:  # per-record gzip members
                parts = [W.gzip_member(W.warc_build([r])) for r in head]
                if poison:
                    parts.append(b"XXJUNKXX" * 4)
                parts.append(W.gzip_member(W.warc_build([nf])))
                payload = b"".join(parts)
            else:
                corrupt = (
                    b"WARC/1.0\r\nWARC-Type: response\r\n"
                    b"Content-Length: 999999\r\n\r\nshort\r\n\r\n"
                )
                payload = (
                    W.warc_build(head)
                    + (corrupt if poison else b"")
                    + W.warc_build([nf])
                )
            ids.append(did)
            payloads.append(payload)
        path = os.path.join(in_dir, f"w{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "asset_id": pa.array(ids, pa.int64()),
                    "kind": pa.array(["warc"] * len(ids)),
                    "payload": pa.array(payloads, pa.binary()),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = os.path.join(base, "warc_out")
    query = wi.start_warc_corpus_ingest(
        wi.read_warc_stream(spark, in_dir, max_files_per_trigger=1),
        out_dir,
        os.path.join(base, "warc_ckpt"),
        quarantine=True,  # r13: dead-letter channel rides the query
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    # cwrej (r13): the dead-letter table read back — one 404 per doc
    # (record 2) and one parse error per poisoned doc (rec_idx -1,
    # status NULL → -1), value-checked closed-form alongside the
    # published set
    rejects = wi.read_rejects(spark, out_dir).select(
        (F.col("asset_id") * 1000 + F.col("rec_idx")).alias("timestamp"),
        F.lit("cwrej").alias("tag"),
        F.coalesce(F.col("status"), F.lit(-1)).cast("double").alias("value"),
    )
    return (
        ci.read_published(spark, out_dir)
        .select(
            F.col("doc_id").alias("timestamp"),
            F.lit("cwarc").alias("tag"),
            F.col("fp53").cast("double").alias("value"),
        )
        .unionByName(rejects)
    )


#: the closed form of the archive-member corpus the carc leg publishes
#: (doc_id stride: the text member is member 0 of each archive)
_CARC_DOCS_SQL = """
    SELECT doc_id * 1000 AS doc_id,
           'Doc ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""


def _archive_ingest_leg(spark: SparkSession, sf_dir: str, base: str) -> DataFrame:
    """2-micro-batch streaming ARCHIVE→corpus ingest (r14): per-doc
    archives whose first member is a closed-form text file and second
    a PNG (routing matters), containers cycled by doc_id (tar /
    zip-deflate / zip-stored), halves by doc_id with pinned mtimes —
    expansion → member routing → near-dup suppression as ONE streaming
    query (streaming/archive_ingest.py). Every 6th doc's archive is
    POISONED (tar: a bad-checksum header after the good members; zip:
    a third member whose central-directory CRC is flipped) — the good
    members still publish and the damage quarantines. Returns
    (doc_id, 'carc', fp53) ∪ (asset·1000−1, 'carj', −1)."""
    from timeseries_db_spark.operators import archive as A
    from timeseries_db_spark.operators.multimodal import png_encode
    from timeseries_db_spark.streaming import archive_ingest as ai
    from timeseries_db_spark.streaming import corpus_ingest as ci

    pdf = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", F.expr(_CWARC_CLEAN).alias("clean"))
        .toPandas()
        .sort_values("doc_id")
    )
    hi = int(pdf["doc_id"].max()) + 1
    in_dir = os.path.join(base, "arc_in")
    os.makedirs(in_dir)
    halves = [pdf[pdf.doc_id < hi // 2], pdf[pdf.doc_id >= hi // 2]]
    for i, half in enumerate(halves):
        ids, payloads = [], []
        for did, clean in zip(half["doc_id"], half["clean"]):
            did = int(did)
            members = [
                ("doc.txt", f"Doc {did} {clean}".encode()),
                ("img.png", png_encode(bytes([did % 256]) * 16, 4, 4, 1)),
            ]
            poison = did % 6 == 0
            mode = did % 3
            if mode == 0:
                payload = A.tar_build(members)
                if poison:
                    bad = bytearray(512)
                    bad[:3] = b"bad"
                    bad[148:156] = b"0000000\x00"
                    payload = payload[:-1024] + bytes(bad) + bytes(1024)
            else:
                ms = members + (
                    [("bad.bin", b"POISONPAYLOAD")] if poison else []
                )
                payload = A.zip_build(ms, deflate=(mode == 1))
                if poison:
                    b2 = bytearray(payload)
                    # the central-directory copy of the name (rfind —
                    # CD follows the local headers); its entry's CRC
                    # field sits 30 bytes before the name
                    at = bytes(b2).rfind(b"bad.bin")
                    b2[at - 30] ^= 0xFF
                    payload = bytes(b2)
            ids.append(did)
            payloads.append(payload)
        path = os.path.join(in_dir, f"a{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "asset_id": pa.array(ids, pa.int64()),
                    "kind": pa.array(["archive"] * len(ids)),
                    "payload": pa.array(payloads, pa.binary()),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = os.path.join(base, "arc_out")
    query = ai.start_archive_corpus_ingest(
        ai.read_archive_stream(spark, in_dir, max_files_per_trigger=1),
        out_dir,
        os.path.join(base, "arc_ckpt"),
        quarantine=True,
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    rejects = ai.read_archive_rejects(spark, out_dir).select(
        (F.col("asset_id") * 1000 - 1).alias("timestamp"),
        F.lit("carj").alias("tag"),
        F.lit(-1.0).alias("value"),
    )
    return (
        ci.read_published(spark, out_dir)
        .select(
            F.col("doc_id").alias("timestamp"),
            F.lit("carc").alias("tag"),
            F.col("fp53").cast("double").alias("value"),
        )
        .unionByName(rejects)
    )


#: closed form of the avro-drop corpus the cavr leg publishes: the real
#: docs plus 50 synthetic extras, MINUS the poisoned shard's block 1
#: (records 10..19 — priced at exactly one dead-letter row, cavj)
_CAVR_DOCS_SQL = """
    SELECT doc_id,
           'Avro ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
    UNION ALL
    SELECT 10000000 + i AS doc_id, 'Avro extra item ' || i AS text
    FROM range(50) r(i) WHERE i < 10 OR i >= 20
"""


def _mixed_ingest_leg(spark: SparkSession, sf_dir: str, base: str) -> DataFrame:
    """ONE-query mixed-arrival ingest (r16, VERDICT item 2 —
    consolidating the r15 avro + csv legs and gate-pinning jsonl).
    The landing directory holds every shard at once: two clean Avro
    shards of the real docs (deflate + snappy codecs) plus a third
    synthetic shard whose BLOCK 1 payload is replaced by junk (the
    per-block quarantine prices it at its 10 records + ONE dead-letter
    row while the sibling blocks of the SAME file publish), two
    headered CSV shards with one type-broken line each, and two JSONL
    shards with one truncated line each. A single
    ``streaming/mixed_ingest.py`` query routes the one shared
    micro-batch by extension into per-format near-dup states, so each
    format's published set is the SAME batch-boundary-free kept rule
    the separate r15 queries pinned (domination is doc_id-ordered
    within a batch, so shard consolidation cannot change it). r16
    late: .sobj single-object segments (Kafka-archive shape) and
    snappy-framed .jsonl.sz shards ride the SAME query; r17 adds the
    COMPOUND-suffix channels (.csv.gz → 'ccgl', .csv.sz → 'cczl' —
    wrapper inflate + CSV parse, own states). Returns
    (doc_id, 'cavr'|'ccsv'|'cjsl'|'csob'|'cszl'|'ccgl'|'cczl', fp53)
    ∪ (-1,'cavj',1) ∪ (-2,'ccsj',2) ∪ (-3,'cjsj',2)
    ∪ (-4,'csbj',1) ∪ (-5,'cszj',1) ∪ (-6,'cgzj',1)
    ∪ (-7,'ccgj',2) ∪ (-8,'cczj',2); .jsonl.gz
    shards ride too ('cgzl' published set, one truncated shard)."""
    import json as _json

    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.streaming import avro_ingest as vi
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import csv_ingest as xi
    from timeseries_db_spark.streaming import jsonl_ingest as ji
    from timeseries_db_spark.streaming import mixed_ingest as mi

    pdf = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", F.expr(_CWARC_CLEAN).alias("clean"))
        .toPandas()
        .sort_values("doc_id")
    )
    hi = int(pdf["doc_id"].max()) + 1
    in_dir = os.path.join(base, "mixed_in")
    os.makedirs(in_dir)
    halves = [pdf[pdf.doc_id < hi // 2], pdf[pdf.doc_id >= hi // 2]]
    for i, half in enumerate(halves):
        recs = [
            {"doc_id": int(d), "text": f"Avro {int(d)} {c}"}
            for d, c in zip(half["doc_id"], half["clean"])
        ]
        path = os.path.join(in_dir, f"a{i}.avro")
        with open(path, "wb") as f:
            f.write(
                AV.avro_build(
                    recs,
                    AV.CORPUS_AVRO_SCHEMA,
                    codec=("deflate", "snappy")[i],
                    block_records=50,
                )
            )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    # the poisoned third shard: 5 blocks of 10; block 1's payload is
    # replaced (framing consistent, trailing sync INTACT) with varint
    # continuation junk, so record decode fails after the sync
    # verified — the walk continues at the next block with no scan
    extras = [
        {"doc_id": 10_000_000 + i, "text": f"Avro extra item {i}"}
        for i in range(50)
    ]
    clean = AV.avro_build(
        extras, AV.CORPUS_AVRO_SCHEMA, codec="null", block_records=10
    )
    import hashlib
    import json as _json

    sync = hashlib.md5(
        _json.dumps(AV.CORPUS_AVRO_SCHEMA).encode()
    ).digest()
    at = clean.find(sync) + 16
    bounds = []
    while at < len(clean):
        count, a2 = AV._zigzag_decode(clean, at)
        size, a3 = AV._zigzag_decode(clean, a2)
        bounds.append((at, count, size, a3))
        at = a3 + size + 16
    b1_at, count1, size1, pay1 = bounds[1]
    junk = b"\x80" * 26
    poisoned = (
        clean[:b1_at]
        + AV._zigzag_encode(count1)
        + AV._zigzag_encode(len(junk))
        + junk
        + sync
        + clean[pay1 + size1 + 16 :]
    )
    path = os.path.join(in_dir, "a2.avro")
    with open(path, "wb") as f:
        f.write(poisoned)
    os.utime(path, (1_700_000_002, 1_700_000_002))

    # CSV shards: headered, QUOTED text fields (commas/quotes in the
    # doc text survive the RFC-4180 doubling), one type-broken line
    # per shard — the line-record quarantine parses everything in one
    # JVM from_csv pass, broken lines dead-letter (ccsj counts 2)
    def quote(t: str) -> str:
        return '"' + t.replace('"', '""') + '"'
    for i, half in enumerate(halves):
        lines = ["doc_id,text,lang,source,n_chars\n"]
        for did, clean in zip(half["doc_id"], half["clean"]):
            t = f"Csv {int(did)} {clean}"
            lines.append(f"{int(did)},{quote(t)},en,web,{len(t)}\n")
        lines.append(f'-88,"broken shard {i}",en,web,NOPE\n')
        path = os.path.join(in_dir, f"c{i}.csv")
        with open(path, "w") as f:
            f.write("".join(lines))
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    # JSONL shards (r16 — the sixth arrival format, previously
    # pytest-only): one truncated line per shard dead-letters (cjsj
    # counts 2); the projection is the batch reader's own
    # jsonl_lines_to_corpus, so the decode surface is already under
    # the csvfmt-style value oracle
    for i, half in enumerate(halves):
        lines = []
        for did, clean in zip(half["doc_id"], half["clean"]):
            t = f"Jsl {int(did)} {clean}"
            lines.append(
                _json.dumps(
                    {
                        "doc_id": int(did),
                        "text": t,
                        "lang": "en",
                        "source": "web",
                        "n_chars": len(t),
                    }
                )
                + "\n"
            )
        lines.append(f'{{"doc_id": -99, "text": "broken shard {i}\n')
        path = os.path.join(in_dir, f"j{i}.jsonl")
        with open(path, "w") as f:
            f.write("".join(lines))
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    # r16: SINGLE-OBJECT segments (.sobj — raw Kafka-archive shape,
    # per-message C3 01 + CRC-64-AVRO fingerprint) with one markerless
    # junk segment (csbj counts 1), and SNAPPY-FRAMED .sz shards
    # (jsonl inside, per-chunk masked CRC-32C) with one flipped-byte
    # shard whose damaged chunk is CRC-rejected (cszj counts 1)
    from timeseries_db_spark.functions.snappy import (
        snappy_framed_compress,
    )
    from timeseries_db_spark.sources.manifest import (
        write_shard_with_manifest,
    )

    # r17: first-party trailer-less shards carry sidecar manifests —
    # the streaming kernels verify them on clean decodes (the junk /
    # flipped shards below stay covered by their own CRC / marker
    # pricing, and foreign manifest-less shards skip the check)
    for i, half in enumerate(halves):
        write_shard_with_manifest(
            os.path.join(in_dir, f"s{i}.sobj"),
            AV.single_object_encode(
                [
                    {"doc_id": int(d), "text": f"Sob {int(d)} {c}"}
                    for d, c in zip(half["doc_id"], half["clean"])
                ],
                AV.CORPUS_AVRO_SCHEMA,
            ),
            len(half),
        )
        body = b"".join(
            _json.dumps(
                {"doc_id": int(d), "text": f"Szs {int(d)} {c}"}
            ).encode() + b"\n"
            for d, c in zip(half["doc_id"], half["clean"])
        )
        write_shard_with_manifest(
            os.path.join(in_dir, f"z{i}.jsonl.sz"),
            snappy_framed_compress(body),
            len(half),
        )
    with open(os.path.join(in_dir, "s2.sobj"), "wb") as f:
        f.write(b"\x00no marker in this segment\x00")
    # r16 late: GZIPPED jsonl shards (.jsonl.gz — the single most
    # common shard wrapper) ride the same query; one truncated shard
    # keeps its decoded prefix and dead-letters one sentinel (cgzj)
    import gzip as _gzip

    for i, half in enumerate(halves):
        body = b"".join(
            _json.dumps(
                {"doc_id": int(d), "text": f"Gzl {int(d)} {c}"}
            ).encode() + b"\n"
            for d, c in zip(half["doc_id"], half["clean"])
        )
        with open(os.path.join(in_dir, f"g{i}.jsonl.gz"), "wb") as f:
            f.write(_gzip.compress(body))
    whole = _gzip.compress(b'{"doc_id": -6, "text": "cut"}\n' * 40)
    with open(os.path.join(in_dir, "g2.jsonl.gz"), "wb") as f:
        f.write(whole[: len(whole) // 2])
    flipped = bytearray(
        snappy_framed_compress(b'{"doc_id": -7, "text": "gone"}\n')
    )
    flipped[14] ^= 0x01
    with open(os.path.join(in_dir, "z2.jsonl.sz"), "wb") as f:
        f.write(bytes(flipped))
    # r17 (VERDICT item 5): COMPOUND-suffix shards — .csv.gz and
    # .csv.sz route by the format UNDER the wrapper and publish
    # through the CSV closed form into their own channels (ccgl/cczl);
    # one type-broken line per shard dead-letters (ccgj/cczj count 2).
    # Budget math per VERDICT item 6 lives in SCALE.md ("Gate budget",
    # r17): +2 channels ≈ +7 s on the 70.9 s entry.
    def _quote_csv(t: str) -> str:
        return '"' + t.replace('"', '""') + '"'

    for i, half in enumerate(halves):
        for wrapper, prefix, compress in (
            ("gz", "Cxg", _gzip.compress),
            ("sz", "Cxz", snappy_framed_compress),
        ):
            lines = ["doc_id,text,lang,source,n_chars\n"]
            for did, c in zip(half["doc_id"], half["clean"]):
                t = f"{prefix} {int(did)} {c}"
                lines.append(
                    f"{int(did)},{_quote_csv(t)},en,web,{len(t)}\n"
                )
            lines.append(f'-97,"broken shard {i}",en,web,NOPE\n')
            path = os.path.join(in_dir, f"x{i}.csv.{wrapper}")
            with open(path, "wb") as f:
                f.write(compress("".join(lines).encode()))
            os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_root = os.path.join(base, "mixed_out")
    query = mi.start_mixed_corpus_ingest(
        mi.read_mixed_file_stream(spark, in_dir),
        out_root,
        os.path.join(base, "mixed_ckpt"),
        quarantine=True,
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    def published(fmt: str, tag: str) -> DataFrame:
        return ci.read_published(spark, os.path.join(out_root, fmt)).select(
            F.col("doc_id").alias("timestamp"),
            F.lit(tag).alias("tag"),
            F.col("fp53").cast("double").alias("value"),
        )

    def dead_letter(rejects: DataFrame, ts: int, tag: str) -> DataFrame:
        return rejects.agg(
            F.count("*").cast("double").alias("value")
        ).select(
            F.lit(ts).cast("long").alias("timestamp"),
            F.lit(tag).alias("tag"),
            "value",
        )

    return (
        published("avro", "cavr")
        .unionByName(
            dead_letter(
                vi.read_avro_rejects(spark, os.path.join(out_root, "avro")),
                -1,
                "cavj",
            )
        )
        .unionByName(published("csv", "ccsv"))
        .unionByName(
            dead_letter(
                xi.read_csv_rejects(spark, os.path.join(out_root, "csv")),
                -2,
                "ccsj",
            )
        )
        .unionByName(published("jsonl", "cjsl"))
        .unionByName(
            dead_letter(
                ji.read_jsonl_rejects(
                    spark, os.path.join(out_root, "jsonl")
                ),
                -3,
                "cjsj",
            )
        )
        .unionByName(published("sobj", "csob"))
        .unionByName(
            dead_letter(
                vi.read_avro_rejects(spark, os.path.join(out_root, "sobj")),
                -4,
                "csbj",
            )
        )
        .unionByName(published("gz", "cgzl"))
        .unionByName(
            dead_letter(
                ji.read_jsonl_rejects(spark, os.path.join(out_root, "gz")),
                -6,
                "cgzj",
            )
        )
        .unionByName(published("sz", "cszl"))
        .unionByName(
            dead_letter(
                ji.read_jsonl_rejects(spark, os.path.join(out_root, "sz")),
                -5,
                "cszj",
            )
        )
        .unionByName(published("csv_gz", "ccgl"))
        .unionByName(
            dead_letter(
                xi.read_csv_rejects(
                    spark, os.path.join(out_root, "csv_gz")
                ),
                -7,
                "ccgj",
            )
        )
        .unionByName(published("csv_sz", "cczl"))
        .unionByName(
            dead_letter(
                xi.read_csv_rejects(
                    spark, os.path.join(out_root, "csv_sz")
                ),
                -8,
                "cczj",
            )
        )
    )


#: closed form of the CSV-shard corpus the ccsv leg publishes
_CCSV_DOCS_SQL = """
    SELECT doc_id,
           'Csv ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""

#: closed form of the JSONL-shard corpus the cjsl leg publishes (r16)
_CJSL_DOCS_SQL = """
    SELECT doc_id,
           'Jsl ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""

#: closed form of the single-object-segment corpus (csob, r16)
_CSOB_DOCS_SQL = """
    SELECT doc_id,
           'Sob ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""

#: closed form of the gzipped-jsonl-shard corpus (cgzl, r16)
_CGZL_DOCS_SQL = """
    SELECT doc_id,
           'Gzl ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""

#: closed form of the snappy-framed-shard corpus (cszl, r16)
_CSZL_DOCS_SQL = """
    SELECT doc_id,
           'Szs ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""

#: closed form of the gzipped-CSV-shard corpus (ccgl, r17 — the
#: compound-suffix route: gz inflate + CSV parse)
_CCGL_DOCS_SQL = """
    SELECT doc_id,
           'Cxg ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""

#: closed form of the snappy-framed-CSV-shard corpus (cczl, r17)
_CCZL_DOCS_SQL = """
    SELECT doc_id,
           'Cxz ' || doc_id || ' ' ||
           trim(regexp_replace(regexp_replace(text, '[<>&]|[^ -~]', '', 'g'),
                ' +', ' ', 'g')) AS text
    FROM documents
"""


def stream_ingest_dedup_sql() -> str:
    """Closed form of the final table: every key i∈[0, N0+NEW) exactly
    once with the ORIGINAL value formula — duplicates collapsed, poison
    re-sends never landed. The corpus leg is the batch-boundary-free
    dominated-by-earlier closed form from
    ``streaming/corpus_ingest.py``."""
    from timeseries_db_spark.operators.similarity import (
        IVF_CENTROID_HASH_DUCK,
        IVF_NLIST,
    )
    from timeseries_db_spark.streaming.corpus_ingest import corpus_ingest_kept_sql

    carc_kept = corpus_ingest_kept_sql(docs_sql=_CARC_DOCS_SQL)
    cavr_kept = corpus_ingest_kept_sql(docs_sql=_CAVR_DOCS_SQL)
    ccsv_kept = corpus_ingest_kept_sql(docs_sql=_CCSV_DOCS_SQL)
    cjsl_kept = corpus_ingest_kept_sql(docs_sql=_CJSL_DOCS_SQL)
    csob_kept = corpus_ingest_kept_sql(docs_sql=_CSOB_DOCS_SQL)
    cszl_kept = corpus_ingest_kept_sql(docs_sql=_CSZL_DOCS_SQL)
    cgzl_kept = corpus_ingest_kept_sql(docs_sql=_CGZL_DOCS_SQL)
    ccgl_kept = corpus_ingest_kept_sql(docs_sql=_CCGL_DOCS_SQL)
    cczl_kept = corpus_ingest_kept_sql(docs_sql=_CCZL_DOCS_SQL)
    return f"""
        SELECT {ING_BASE} + i * 1000 AS "timestamp",
               {_sess_case("i")} AS tag,
               CAST(1 + i % 7 AS DOUBLE) AS value
        FROM range({ING_N0 + ING_NEW}) r(i)
        UNION ALL
        SELECT doc_id AS "timestamp", 'cdoc' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({corpus_ingest_kept_sql()})
        UNION ALL
        -- cwarc (r12): the published set of the streaming WARC ingest —
        -- the SAME batch-boundary-free kept rule over the closed form
        -- of the WARC-extracted corpus
        SELECT doc_id AS "timestamp", 'cwarc' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({corpus_ingest_kept_sql(docs_sql=_CWARC_DOCS_SQL)})
        UNION ALL
        -- cwrej (r13): the streaming dead-letter channel — every doc's
        -- 404 page is rejected at record 2; every 6th doc's corrupt
        -- record quarantines as a rec_idx -1 parse error (status -1)
        SELECT doc_id * 1000 + 2 AS "timestamp", 'cwrej' AS tag,
               404.0 AS value
        FROM documents
        UNION ALL
        SELECT doc_id * 1000 - 1 AS "timestamp", 'cwrej' AS tag,
               -1.0 AS value
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        -- carc (r14): the streaming ARCHIVE ingest published set — the
        -- SAME batch-boundary-free kept rule over the closed form of
        -- the text members (the poisoned archives' good members still
        -- publish, so the set is corruption-invariant)
        SELECT doc_id AS "timestamp", 'carc' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({carc_kept})
        UNION ALL
        -- carj (r14): the archive dead-letter channel — every 6th
        -- doc's poisoned archive quarantines exactly one error row
        SELECT doc_id * 1000 - 1 AS "timestamp", 'carj' AS tag,
               -1.0 AS value
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        -- cavr (r15): the streaming AVRO-drop ingest published set —
        -- the kept rule over the real docs + synthetic extras MINUS
        -- the poisoned block's 10 records
        SELECT doc_id AS "timestamp", 'cavr' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({cavr_kept})
        UNION ALL
        -- cavj (r15): the avro dead-letter channel — the poisoned
        -- block costs exactly one reject row
        SELECT -1 AS "timestamp", 'cavj' AS tag, 1.0 AS value
        UNION ALL
        -- ccsv (r15): the streaming CSV ingest published set — the
        -- kept rule over the quoted-field closed form
        SELECT doc_id AS "timestamp", 'ccsv' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({ccsv_kept})
        UNION ALL
        -- ccsj (r15): one type-broken line per shard dead-letters
        SELECT -2 AS "timestamp", 'ccsj' AS tag, 2.0 AS value
        UNION ALL
        -- cjsl (r16): the streaming JSONL ingest published set — the
        -- kept rule over the jsonl closed form (the sixth arrival
        -- format, riding the consolidated mixed-arrival query)
        SELECT doc_id AS "timestamp", 'cjsl' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({cjsl_kept})
        UNION ALL
        -- cjsj (r16): one truncated line per jsonl shard dead-letters
        SELECT -3 AS "timestamp", 'cjsj' AS tag, 2.0 AS value
        UNION ALL
        -- csob (r16): the single-object (Kafka-archive) streaming
        -- published set; the markerless junk segment dead-letters one
        SELECT doc_id AS "timestamp", 'csob' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({csob_kept})
        UNION ALL
        SELECT -4 AS "timestamp", 'csbj' AS tag, 1.0 AS value
        UNION ALL
        -- cgzl (r16): the gzipped (.jsonl.gz) streaming published
        -- set; the truncated shard dead-letters one sentinel
        SELECT doc_id AS "timestamp", 'cgzl' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({cgzl_kept})
        UNION ALL
        SELECT -6 AS "timestamp", 'cgzj' AS tag, 1.0 AS value
        UNION ALL
        -- cszl (r16): the snappy-framed (.jsonl.sz) streaming
        -- published set; the flipped shard's CRC-rejected chunk
        -- dead-letters one sentinel
        SELECT doc_id AS "timestamp", 'cszl' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({cszl_kept})
        UNION ALL
        SELECT -5 AS "timestamp", 'cszj' AS tag, 1.0 AS value
        UNION ALL
        -- ccgl/cczl (r17): the COMPOUND-suffix channels — .csv.gz /
        -- .csv.sz shards route by the format UNDER the wrapper and
        -- publish through the CSV closed form into their own states;
        -- one type-broken line per shard dead-letters
        SELECT doc_id AS "timestamp", 'ccgl' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({ccgl_kept})
        UNION ALL
        SELECT -7 AS "timestamp", 'ccgj' AS tag, 2.0 AS value
        UNION ALL
        SELECT doc_id AS "timestamp", 'cczl' AS tag,
               CAST(fp53 AS DOUBLE) AS value
        FROM ({cczl_kept})
        UNION ALL
        SELECT -8 AS "timestamp", 'cczj' AS tag, 2.0 AS value
        UNION ALL
        -- sivf (r16): incremental IVF assignment of the re-keyed
        -- arrival vectors against the frozen portable-hash centroid
        -- sample — the SAME rounded-cosine / centroid-id-ASC rule the
        -- batch IVF entry pins; sivg restates per-list growth
        SELECT "timestamp", tag, value FROM (
            WITH cents AS (
                SELECT vec_id AS cid, embedding AS ce FROM embeddings
                ORDER BY {IVF_CENTROID_HASH_DUCK}, vec_id
                LIMIT {IVF_NLIST}
            ),
            newv AS (
                SELECT vec_id + 1000000 AS vid, embedding
                FROM embeddings WHERE vec_id % 7 = 3
            ),
            scored AS (
                SELECT vid, cid,
                       round(list_cosine_similarity(
                           newv.embedding::DOUBLE[], ce::DOUBLE[]), 6)
                           AS s6
                FROM newv CROSS JOIN cents
            ),
            a AS (
                SELECT vid, cid,
                       row_number() OVER (
                           PARTITION BY vid ORDER BY s6 DESC, cid ASC
                       ) AS rn
                FROM scored
            )
            SELECT vid AS "timestamp", 'sivf' AS tag,
                   CAST(cid AS DOUBLE) AS value
            FROM a WHERE rn = 1
            UNION ALL
            SELECT cid AS "timestamp", 'sivg' AS tag,
                   CAST(COUNT(*) AS DOUBLE) AS value
            FROM a WHERE rn = 1 GROUP BY cid
        )
        UNION ALL
        -- sasof: event at hour k joins the rate row at the latest
        -- every-3rd hour <= k: rate = 1 + 10*(3*(k//3)) + tag_idx,
        -- tag_idx = i % 4 by construction
        SELECT {ING_BASE} + i * {SASOF_STEP_MS} AS "timestamp",
               'sasof' AS tag,
               CAST(1 + 10 * (3 * (((i * {SASOF_STEP_MS}) // {SASOF_HOUR_MS}) // 3))
                      + i % 4 AS DOUBLE) AS value
        FROM range({SASOF_N}) r(i)
        UNION ALL
        -- ssj: every event joined to same-tag alerts (value > 90)
        -- at-or-before it within the tolerance — the batch theta twin
        -- of the stream-stream join
        SELECT e."timestamp", 'ssj' AS tag,
               CAST(a."timestamp" AS DOUBLE) AS value
        FROM (SELECT epoch_ms(ts) AS "timestamp", event_type AS tag
              FROM events) e
        JOIN (SELECT epoch_ms(ts) AS "timestamp", event_type AS tag
              FROM events WHERE value > 90) a
          ON a.tag = e.tag
         AND a."timestamp" >= e."timestamp" - {SSJ_TOLERANCE_MS}
         AND a."timestamp" <= e."timestamp"
    """


def register_streaming(q: dict, o: dict) -> None:
    q["stream_running_totals"] = stream_running_totals
    o["stream_running_totals"] = stream_running_totals_sql()
    q["stream_sessions"] = stream_sessions
    o["stream_sessions"] = stream_sessions_sql()
    q["stream_ingest_dedup"] = stream_ingest_dedup
    o["stream_ingest_dedup"] = stream_ingest_dedup_sql()
