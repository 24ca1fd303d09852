"""Structured Streaming ingest + rollup: file-source streams driven to
completion with processAllAvailable, checked against batch ground truth."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from timeseries_db_spark.operators.dml import TsTable
from timeseries_db_spark.sources.tables import events_as_tsdb
from timeseries_db_spark.streaming import ingest


def _events_glob(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def test_stream_ingest_into_table(spark, sf_dir, tmp_path):
    stream = ingest.read_events_stream(spark, _events_glob(sf_dir))
    table = TsTable.create(spark, str(tmp_path / "tbl"))
    q = ingest.start_ingest(stream, table, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = table.read()
    expected = events_as_tsdb(spark, sf_dir).dropDuplicates(["timestamp", "tag"])
    assert got.count() == expected.count()
    # spot-check contents: aggregate equality
    g = got.agg(F.sum("value"), F.min("timestamp"), F.max("timestamp")).first()
    e = expected.agg(F.sum("value"), F.min("timestamp"), F.max("timestamp")).first()
    assert abs(g[0] - e[0]) < 1e-6 and g[1] == e[1] and g[2] == e[2]


def test_stream_ingest_is_idempotent_on_replay(spark, sf_dir, tmp_path):
    """Re-delivering the same files (fresh checkpoint, same table) must not
    duplicate rows — the per-batch anti-join drops late/replayed keys."""
    table = TsTable.create(spark, str(tmp_path / "tbl"))
    for ckpt in ("ckpt1", "ckpt2"):
        stream = ingest.read_events_stream(spark, _events_glob(sf_dir))
        q = ingest.start_ingest(stream, table, str(tmp_path / ckpt))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    expected = (
        events_as_tsdb(spark, sf_dir).dropDuplicates(["timestamp", "tag"]).count()
    )
    assert table.read().count() == expected


def test_read_events_stream_empty_dir_falls_back_to_pinned_schema(
    spark, tmp_path
):
    """Starting the stream before producers write any file (the normal
    file-stream pattern) must not fail schema inference — the probe read
    falls back to EVENTS_STREAM_SCHEMA (ADVICE r6)."""
    empty = tmp_path / "empty_in"
    empty.mkdir()
    stream = ingest.read_events_stream(spark, str(empty))
    assert stream.isStreaming
    assert set(["timestamp", "tag", "value", "event_time"]) <= set(stream.columns)


def test_streaming_rollup_matches_batch_twin(spark, sf_dir, tmp_path):
    stream = ingest.read_events_stream(spark, _events_glob(sf_dir))
    rolled = ingest.windowed_rollup_stream(stream)
    q = (
        rolled.writeStream.outputMode("append")
        .format("memory")
        .queryName("rollup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"], r["tag"]): (r["cnt"], r["total"])
        for r in spark.sql("SELECT * FROM rollup_out").collect()
    }
    from timeseries_db_spark.operators.rollup import window_rollup

    batch = {
        (r["window_start"], r["tag"]): (r["cnt"], r["total"])
        for r in window_rollup(events_as_tsdb(spark, sf_dir)).collect()
    }
    # append mode emits only watermark-closed windows; the final window may
    # be withheld. Everything emitted must match the batch result exactly.
    assert set(got) <= set(batch)
    assert len(got) >= 0.9 * len(batch)
    for k, v in got.items():
        assert v[0] == batch[k][0]
        assert abs(v[1] - batch[k][1]) < 1e-6


def test_stream_ingest_resumes_from_checkpoint_after_stop(
    spark, sf_dir, tmp_path
):
    """Crash/recovery proof for the exactly-once claim: stop the query
    after it has ingested only the first file, restart from the SAME
    checkpoint with a second (key-overlapping) file present, and the
    final table must equal a single uninterrupted run over both files —
    the checkpoint must not re-ingest file 1, and the overlap keys must
    not duplicate."""
    import shutil

    batch = events_as_tsdb(spark, sf_dir).orderBy("timestamp", "tag").limit(500)
    part1 = batch.limit(300)
    part2 = batch.subtract(part1.limit(200))  # rows 200-499: 100-key overlap

    def stage(df, name):
        d = tmp_path / ("stage_" + name)
        df.coalesce(1).write.parquet(str(d))
        (f,) = [e for e in os.listdir(d) if e.endswith(".parquet")]
        return d / f

    def run(in_dir, table, ckpt):
        stream = ingest.read_events_stream(
            spark, str(in_dir), max_files_per_trigger=1
        )
        q = ingest.start_ingest(stream, table, str(ckpt))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # the tsdb-shaped slices have (timestamp, tag, value) columns; wrap
    # them back into the events layout the stream reader expects
    def to_events(df):
        return df.select(
            F.monotonically_increasing_id().alias("event_id"),
            F.timestamp_millis(F.col("timestamp")).alias("ts"),
            F.lit(0).cast("long").alias("user_id"),
            F.col("tag").alias("event_type"),
            F.col("value"),
            F.lit("{}").alias("props"),
        )

    f1, f2 = stage(to_events(part1), "e1"), stage(to_events(part2), "e2")

    # reference: one uninterrupted run over both files
    ref_in = tmp_path / "ref_in"
    ref_in.mkdir()
    shutil.copy(f1, ref_in / "f1.parquet")
    shutil.copy(f2, ref_in / "f2.parquet")
    ref_tbl = TsTable.create(spark, str(tmp_path / "ref_tbl"))
    run(ref_in, ref_tbl, tmp_path / "ref_ckpt")

    # crash run: file 1 only → stop → file 2 appears → SAME checkpoint
    cr_in = tmp_path / "cr_in"
    cr_in.mkdir()
    shutil.copy(f1, cr_in / "f1.parquet")
    cr_tbl = TsTable.create(spark, str(tmp_path / "cr_tbl"))
    run(cr_in, cr_tbl, tmp_path / "cr_ckpt")
    v_after_first = cr_tbl.version()
    shutil.copy(f2, cr_in / "f2.parquet")
    run(cr_in, cr_tbl, tmp_path / "cr_ckpt")

    ref_rows = {
        (r["timestamp"], r["tag"], r["value"]) for r in ref_tbl.read().collect()
    }
    cr_rows = {
        (r["timestamp"], r["tag"], r["value"]) for r in cr_tbl.read().collect()
    }
    assert ref_rows == cr_rows and len(ref_rows) > 0
    # the restart ingested only the NEW file's novel keys (no rewrite of
    # file 1's commit): exactly one more insert landed
    assert cr_tbl.version() > v_after_first


def test_streaming_sliding_rollup_matches_batch_twin(spark, sf_dir, tmp_path):
    """Sliding-window streaming rollup (1h window / 15m slide) equals the
    batch sliding twin on every watermark-closed window — the shared
    aggregate body makes the parity structural."""
    stream = ingest.read_events_stream(spark, _events_glob(sf_dir))
    rolled = ingest.windowed_rollup_stream(stream, slide="15 minutes")
    q = (
        rolled.writeStream.outputMode("append")
        .format("memory")
        .queryName("slide_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"], r["tag"]): (r["cnt"], r["total"])
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    from timeseries_db_spark.operators.rollup import window_rollup_sliding

    batch = {
        (r["window_start"], r["tag"]): (r["cnt"], r["total"])
        for r in window_rollup_sliding(
            events_as_tsdb(spark, sf_dir), "1 hour", "15 minutes"
        ).collect()
    }
    assert set(got) <= set(batch)
    assert len(got) >= 0.9 * len(batch)
    for k, v in got.items():
        assert v == batch[k]


def test_stream_stream_time_bounded_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner join with watermarks + event-time bounds:
    every event joined to same-tag 'alerts' (value > 90) at-or-before it
    within 5 minutes must equal the batch join exactly once the finite
    input drains — the watermark bounds STATE, not the result set."""
    from timeseries_db_spark.streaming import joins as sjoins

    events = ingest.read_events_stream(spark, _events_glob(sf_dir))
    alerts = ingest.read_events_stream(spark, _events_glob(sf_dir)).filter(
        "value > 90"
    )
    out = sjoins.enrich_with_alerts(events, alerts)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["timestamp"], r["tag"], r["alert_ts"], r["alert_value"])
        for r in spark.sql("SELECT * FROM ss_join_out").collect()
    }
    t = events_as_tsdb(spark, sf_dir)
    al = t.filter("value > 90").select(
        F.col("tag").alias("a_tag"),
        F.col("timestamp").alias("alert_ts"),
        F.col("value").alias("alert_value"),
    )
    batch = {
        (r["timestamp"], r["tag"], r["alert_ts"], r["alert_value"])
        for r in t.join(
            al,
            (F.col("tag") == F.col("a_tag"))
            & (F.col("alert_ts") >= F.col("timestamp") - 300_000)
            & (F.col("alert_ts") <= F.col("timestamp")),
            "inner",
        ).collect()
    }
    assert len(batch) > 0
    assert got == batch


def test_corpus_ingest_near_dup_suppression(spark, tmp_path):
    """Streaming corpus ingest over a planted 3-file corpus: exact
    copies are suppressed both within a batch and across batches (via
    the persisted signature index), uniques publish, and the final
    published set equals the batch-boundary-free DuckDB closed form.
    Restarting the stream with a later file and the SAME checkpoint
    extends the published set consistently (the seen-index filter)."""
    import time

    import duckdb
    import pandas as pd

    from timeseries_db_spark.streaming import corpus_ingest as ci

    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "one two three four five six seven eight nine ten"
    Z = "red orange yellow green blue indigo violet umber ochre teal"
    b0 = pd.DataFrame({"doc_id": [0, 1, 2], "text": [X, X, Y]})
    b1 = pd.DataFrame({"doc_id": [3, 4], "text": [X, Y]})
    b2 = pd.DataFrame({"doc_id": [5, 6], "text": [Z, Z]})
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(name, pdf):
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name)
        )
        # single stable file with its own mtime tick
        import glob
        import shutil

        src = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(src, str(in_dir / name))
        time.sleep(1.1)

    write("b0.parquet", b0)
    write("b1.parquet", b1)

    stream = ci.read_docs_stream(spark, str(in_dir), max_files_per_trigger=1)
    q = ci.start_corpus_ingest(stream, out_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub1 = {
        r["doc_id"] for r in ci.read_published(spark, out_dir).collect()
    }
    # within-b0: doc1 (copy of doc0) suppressed; cross-batch: doc3 (=X)
    # and doc4 (=Y) suppressed by the signature index
    assert pub1 == {0, 2}

    # restart with a NEW file on the SAME checkpoint: only b2 processes
    write("b2.parquet", b2)
    q = ci.start_corpus_ingest(
        ci.read_docs_stream(spark, str(in_dir), max_files_per_trigger=1),
        out_dir,
        ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = ci.read_published(spark, out_dir).toPandas()
    assert set(pub["doc_id"]) == {0, 2, 5}

    # the DuckDB closed form over the full corpus agrees row-for-row
    con = duckdb.connect()
    con.register(
        "documents", pd.concat([b0, b1, b2], ignore_index=True)
    )
    ora = con.sql(ci.corpus_ingest_kept_sql()).df()
    got = pub[["doc_id", "fp53"]].sort_values("doc_id").reset_index(drop=True)
    exp = ora.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["fp53"].tolist() == exp["fp53"].tolist()


def test_warc_streaming_ingest_one_query_chain(spark, tmp_path):
    """r12: the full Common-Crawl pipeline as ONE streaming query —
    WARC files (with gzip record members, chunked transfer-encoding,
    and Content-Encoding gzip cycled across assets) flow through
    HTTP decode → HTML→text → near-dup suppression. Exact-copy pages
    are suppressed within AND across micro-batches; the published
    texts are the decoded extractions, not the raw bytes."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseries_db_spark.operators import warc as W
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import warc_ingest as wi

    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "one two three four five six seven eight nine ten"

    def asset(aid: int, text: str) -> bytes:
        html = f"<html><body><p>{text}</p></body></html>"
        t = aid % 4
        block = W.http_response_block(
            html.encode("utf-8"), gzip_body=(t == 3), chunked=(t in (2, 3))
        )
        return W.warc_build(
            [
                ("warcinfo", "", b"software: x\r\n"),
                ("response", f"http://e/{aid}", block),
            ],
            gzip_records=(t == 1),
        )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 0: assets 0 (X, plain), 1 (X copy, gzip members), 2 (Y, chunked)
    # batch 1: assets 3 (X copy, CE gzip + chunked), 4 (Y copy, plain)
    batches = [[(0, X), (1, X), (2, Y)], [(3, X), (4, Y)]]
    for i, rows in enumerate(batches):
        path = str(in_dir / f"w{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "asset_id": pa.array([a for a, _ in rows], pa.int64()),
                    "kind": pa.array(["warc"] * len(rows)),
                    "payload": pa.array(
                        [asset(a, t) for a, t in rows], pa.binary()
                    ),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = str(tmp_path / "out")
    q = wi.start_warc_corpus_ingest(
        wi.read_warc_stream(spark, str(in_dir), max_files_per_trigger=1),
        out_dir,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    # doc_id = asset_id * 1000 + rec_idx (response is record 1);
    # within-b0 copy 1 suppressed, cross-batch copies 3 and 4 suppressed
    assert set(pub) == {1, 2001}
    assert pub[1] == X and pub[2001] == Y  # decoded + extracted, not raw


def test_corpus_ingest_crash_between_writes_heals_on_replay(spark, tmp_path):
    """Crash-inject between the signature write and the docs write: the
    half-written attempt leaves a sigs/batch=N partition with no
    matching docs partition; replaying the SAME batch id overwrites
    both, and because the seen read filters batch < current, the
    orphaned attempt never dominates its own retry — the final state
    equals the crash-free run."""
    import pandas as pd
    import pytest as _pytest

    from timeseries_db_spark.streaming import corpus_ingest as ci

    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "one two three four five six seven eight nine ten"
    b0 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": [X, Y]})
    )
    b1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2, 3], "text": [X, "unique words only here"]})
    )
    out = str(tmp_path / "out")
    ci.process_corpus_batch(b0, 0, out)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        ci.process_corpus_batch(b1, 1, out, _crash_before_docs=True)
    # replay batch 1 (what the checkpoint does after restart)
    ci.process_corpus_batch(b1, 1, out)
    pub = {r["doc_id"] for r in ci.read_published(spark, out).collect()}
    assert pub == {0, 1, 3}  # doc2 (=X) suppressed; doc3 unique kept
    sigs = spark.read.parquet(out + "/sigs")
    assert {r["doc_id"] for r in sigs.collect()} == {0, 1, 2, 3}


def test_streaming_asof_enrich_matches_batch_and_sees_updates(spark, tmp_path):
    """foreachBatch as-of enrichment: batch 0 enriches against the
    reference's initial snapshot; the reference is updated between
    batches, and batch 1 is enriched against the NEW snapshot (per-batch
    snapshot isolation) — both outputs equal the batch as-of join run
    against the snapshot each batch actually saw."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseries_db_spark.operators.asof import asof_join
    from timeseries_db_spark.operators.dml import TsTable
    from timeseries_db_spark.streaming.joins import start_asof_enrich

    ref = TsTable.create(spark, str(tmp_path / "ref"))
    ref.insert(
        spark.createDataFrame(
            [(0, "a", 10.0), (0, "b", 20.0)],
            "timestamp long, tag string, value double",
        )
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["timestamp", "tag", "value"])
        pq.write_table(pa.Table.from_pandas(pdf), str(in_dir / name))
        _time.sleep(1.1)

    write("b0.parquet", [(5_000, "a", 1.0), (6_000, "b", 2.0)])
    stream = (
        spark.readStream.schema("timestamp long, tag string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_asof_enrich(stream, ref, out, ckpt)
    try:
        q.processAllAvailable()
        # reference updated between batches
        ref.update(
            spark.createDataFrame(
                [(0, "a", 99.0)], "timestamp long, tag string, value double"
            )
        )
        write("b1.parquet", [(7_000, "a", 3.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["timestamp"], r["tag"]): r["ref_value"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(5_000, "a"): 10.0, (6_000, "b"): 20.0, (7_000, "a"): 99.0}
    # sanity: the batch as-of against the final snapshot agrees on b1
    b1 = spark.createDataFrame(
        [(7_000, "a", 3.0)], "timestamp long, tag string, value double"
    )
    batch_rows = asof_join(
        b1, ref.read().withColumnRenamed("value", "ref_value"),
        on="tag", payload=["ref_value"],
    ).collect()
    assert batch_rows[0]["ref_value"] == 99.0


def test_corpus_ingest_sig_compaction(spark, tmp_path):
    """Compacting the signature partitions (all but the newest merged
    into one fresh negative-id partition) preserves the dedup decisions
    of later batches, and because the consumer is duplicate-tolerant, a
    crash that leaves BOTH merged and original partitions still yields
    identical results."""
    import glob
    import os

    import pandas as pd

    from timeseries_db_spark.streaming import corpus_ingest as ci

    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "one two three four five six seven eight nine ten"
    Z = "red orange yellow green blue indigo violet umber ochre teal"
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    ci.process_corpus_batch(mk([(0, X)]), 0, out)
    ci.process_corpus_batch(mk([(1, Y)]), 1, out)
    ci.process_corpus_batch(mk([(2, Z)]), 2, out)

    removed = ci.compact_seen_sigs(spark, out)
    assert removed == 1  # batches 0+1 merged into batch=-1; batch=2 kept
    dirs = {os.path.basename(p) for p in glob.glob(out + "/sigs/batch=*")}
    assert dirs == {"batch=-1", "batch=2"}

    # later batch still dedups against COMPACTED history (X and Y live
    # in the merged partition)
    ci.process_corpus_batch(mk([(3, X), (4, Y), (5, "fresh novel words")]), 3, out)
    pub = {r["doc_id"] for r in ci.read_published(spark, out).collect()}
    assert pub == {0, 1, 2, 5}

    # duplicate tolerance: resurrect an absorbed partition (crash sim:
    # merged rows now exist TWICE) and ingest another near-dup — the
    # decision is unchanged
    spark.read.parquet(out + "/sigs/batch=-1").filter(
        "doc_id = 1"
    ).write.mode("overwrite").partitionBy("bucket").parquet(
        out + "/sigs/batch=1"
    )
    ci.process_corpus_batch(mk([(6, Y)]), 4, out)
    pub = {r["doc_id"] for r in ci.read_published(spark, out).collect()}
    assert pub == {0, 1, 2, 5}


def test_corpus_ingest_seen_read_partition_prunes_to_buckets(spark, tmp_path):
    """The band-bucketed seen layout (r9 — previously only a docstring
    promise): the per-batch seen read must open ONLY the files of the
    probe batch's own band buckets. Proven on the real read plan via
    inputFiles — every scanned path carries one of the requested
    bucket ids, and a strict subset of buckets reads a strict subset of
    the files."""
    import pandas as pd

    from timeseries_db_spark.streaming import corpus_ingest as ci

    mk = lambda rows: spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight",
        "red orange yellow green blue indigo violet umber",
        "north south east west up down left right",
    ]
    out = str(tmp_path / "out")
    ci.process_corpus_batch(mk(list(enumerate(texts[:2]))), 0, out)
    ci.process_corpus_batch(mk([(2, texts[2]), (3, texts[3])]), 1, out)
    sig_dir = out + "/sigs"

    from pyspark.sql import functions as F

    def files_scanned(df):
        """Files the EXECUTED plan actually opened (inputFiles() lists
        the base relation pre-pruning, so it cannot prove pruning)."""
        return {
            r["f"]
            for r in df.select(F.input_file_name().alias("f")).distinct().collect()
        }

    all_read = ci._read_seen_sigs(spark, sig_dir, 2)
    all_files = files_scanned(all_read)
    all_buckets = sorted(
        r["bucket"]
        for r in spark.read.parquet(sig_dir).select("bucket").distinct().collect()
    )
    assert len(all_buckets) >= 2  # fixture spreads over several buckets

    subset = all_buckets[: len(all_buckets) // 2]
    pruned = ci._read_seen_sigs(spark, sig_dir, 2, buckets=subset)
    pruned_files = files_scanned(pruned)
    assert pruned_files and pruned_files < all_files
    for f in pruned_files:
        assert any(f"/bucket={b}/" in f for b in subset), f
    # and the pruned read returns exactly the subset's rows
    expected = (
        spark.read.parquet(sig_dir)
        .filter(f"batch < 2 AND bucket IN ({','.join(map(str, subset))})")
        .count()
    )
    assert pruned.count() == expected


def test_corpus_ingest_all_null_batch_publishes_and_prunes_safely(spark, tmp_path):
    """NULL-text docs carry no signature: an ALL-NULL batch produces an
    EMPTY bucket set against a non-empty seen index (the pruned read
    filters on an empty IN-list) and must publish unconditionally
    without disturbing later dedup decisions."""
    from timeseries_db_spark.streaming import corpus_ingest as ci

    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    ci.process_corpus_batch(mk([(0, "alpha beta gamma delta epsilon")]), 0, out)
    ci.process_corpus_batch(mk([(1, None), (2, None)]), 1, out)
    ci.process_corpus_batch(
        mk([(3, "alpha beta gamma delta epsilon"), (4, None)]), 2, out
    )
    pub = sorted(r["doc_id"] for r in ci.read_published(spark, out).collect())
    assert pub == [0, 1, 2, 4]  # 3 suppressed by 0; every NULL publishes


def test_corpus_ingest_compaction_crash_never_loses_history(spark, tmp_path):
    """ADVICE r8: no crash point in the compaction may lose absorbed
    history. Both windows, simulated directly:

    * crash DURING the staged merge write → every source partition is
      intact and the half-written ``.compact_tmp`` is invisible to
      readers; a rerun replaces it and completes;
    * crash AFTER the atomic rename but BEFORE the source deletions →
      duplicate rows only; a rerun absorbs and ``dropDuplicates`` them.
    """
    import glob
    import os
    import shutil

    import pandas as pd

    from timeseries_db_spark.streaming import corpus_ingest as ci

    mk = lambda rows: spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = str(tmp_path / "out")
    texts = [
        "alpha beta gamma delta epsilon",
        "one two three four five",
        "red orange yellow green blue",
        "north south east west center",
    ]
    for i, t in enumerate(texts):
        ci.process_corpus_batch(mk([(i, t)]), i, out)
    baseline = sorted(
        map(tuple, ci.read_published(spark, out).drop("batch").collect())
    )

    # window 1: half-written stage (any junk file) — readers unaffected,
    # rerun completes
    stage = os.path.join(out, "docs", ci._COMPACT_TMP)
    os.makedirs(stage)
    with open(os.path.join(stage, "part-junk.parquet"), "w") as f:
        f.write("not parquet")
    assert (
        sorted(map(tuple, ci.read_published(spark, out).drop("batch").collect()))
        == baseline
    )
    assert ci.compact_published(spark, out) == 2
    assert not os.path.exists(stage)
    assert (
        sorted(map(tuple, ci.read_published(spark, out).drop("batch").collect()))
        == baseline
    )

    # window 2: merged partition renamed into place, sources not yet
    # deleted (resurrect one source = its rows now exist twice) — a
    # rerun clears the duplicates without losing a row
    merged_dir = glob.glob(out + "/docs/batch=-*")[0]
    spark.read.parquet(merged_dir).filter("doc_id = 0").write.parquet(
        out + "/docs/batch=0"
    )
    assert ci.compact_published(spark, out) == 1
    assert (
        sorted(map(tuple, ci.read_published(spark, out).drop("batch").collect()))
        == baseline
    )
    shutil.rmtree(out)


def test_streaming_asof_enrich_replay_pins_reference_version(spark, tmp_path):
    """ADVICE r8: a batch replayed after a crash must rewrite
    VALUE-IDENTICAL rows even if the reference table moved between the
    original attempt and the replay — the joined reference version is
    pinned per batch id in the ``_refver`` sidecar, written before the
    data write."""
    from timeseries_db_spark.operators.dml import TsTable
    from timeseries_db_spark.streaming.joins import process_asof_batch

    ref = TsTable.create(
        spark,
        str(tmp_path / "ref"),
        spark.createDataFrame(
            [(0, "a", 10.0)], "timestamp long, tag string, value double"
        ),
    )
    out = str(tmp_path / "out")
    batch = spark.createDataFrame(
        [(5_000, "a", 1.0)], "timestamp long, tag string, value double"
    )
    process_asof_batch(batch, 0, ref, out)
    first = spark.read.parquet(out + "/batch=0").collect()
    assert first[0]["ref_value"] == 10.0

    # the reference moves, then batch 0 is REPLAYED (crash recovery):
    # the rewrite must join the pinned version, not the current one
    ref.update(
        spark.createDataFrame(
            [(0, "a", 99.0)], "timestamp long, tag string, value double"
        )
    )
    process_asof_batch(batch, 0, ref, out)
    replay = spark.read.parquet(out + "/batch=0").collect()
    assert replay[0]["ref_value"] == 10.0  # pinned, not 99.0

    # a genuinely NEW batch resolves (and pins) the current version
    process_asof_batch(batch, 1, ref, out)
    assert spark.read.parquet(out + "/batch=1").collect()[0]["ref_value"] == 99.0


def test_streaming_asof_enrich_vacuumed_pin_degrades_and_repins(
    spark, tmp_path
):
    """r10 ADVICE: if vacuum() reclaimed the pinned version between
    attempts, the replay must not crash the stream — it warns, reads
    the CURRENT snapshot, and re-pins to it so later replays are stable
    again."""
    import warnings

    from timeseries_db_spark.operators.dml import TsTable
    from timeseries_db_spark.streaming.joins import process_asof_batch

    mk = lambda v: spark.createDataFrame(
        [(0, "a", v)], "timestamp long, tag string, value double"
    )
    ref = TsTable.create(spark, str(tmp_path / "ref"), mk(10.0))
    out = str(tmp_path / "out")
    batch = spark.createDataFrame(
        [(5_000, "a", 1.0)], "timestamp long, tag string, value double"
    )
    process_asof_batch(batch, 0, ref, out)  # pins version 0
    ref.update(mk(99.0))
    ref.vacuum(retain_versions=0)  # version 0 gone
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        process_asof_batch(batch, 0, ref, out)  # replay: degrade + re-pin
    assert any("no longer retained" in str(x.message) for x in w)
    assert (
        spark.read.parquet(out + "/batch=0").collect()[0]["ref_value"] == 99.0
    )
    # re-pinned: another reference move + replay keeps the NEW pin
    ref.update(mk(123.0))
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        process_asof_batch(batch, 0, ref, out)
    assert not w2  # pin resolves — no degradation this time
    assert (
        spark.read.parquet(out + "/batch=0").collect()[0]["ref_value"] == 99.0
    )


def test_streaming_asof_enrich_custom_key(spark, tmp_path):
    """The `on` parameter is honored end-to-end: enrichment keyed on a
    non-default column (user_id) against a reference object exposing
    that key."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseries_db_spark.streaming.joins import start_asof_enrich

    class Ref:
        def read(self):
            return spark.createDataFrame(
                [(0, 7, 1.5), (0, 8, 2.5)],
                "timestamp long, user_id long, value double",
            )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pdf = pd.DataFrame(
        [(1_000, 7, 0.0), (2_000, 8, 0.0)],
        columns=["timestamp", "user_id", "value"],
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(in_dir / "b0.parquet"))
    stream = (
        spark.readStream.schema("timestamp long, user_id long, value double")
        .parquet(str(in_dir))
    )
    q = start_asof_enrich(
        stream, Ref(), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        on="user_id",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["timestamp"], r["user_id"]): r["ref_value"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {(1_000, 7): 1.5, (2_000, 8): 2.5}


def test_corpus_ingest_published_compaction(spark, tmp_path):
    """Compacting the published docs partitions preserves the corpus
    readers see, byte for byte, and later ingests still append."""
    import glob
    import os

    import pandas as pd

    from timeseries_db_spark.streaming import corpus_ingest as ci

    mk = lambda rows: spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = str(tmp_path / "out")
    ci.process_corpus_batch(mk([(0, "alpha beta gamma delta epsilon")]), 0, out)
    ci.process_corpus_batch(mk([(1, "one two three four five")]), 1, out)
    ci.process_corpus_batch(mk([(2, "red orange yellow green blue")]), 2, out)
    before = sorted(
        map(tuple, ci.read_published(spark, out).drop("batch").collect())
    )
    removed = ci.compact_published(spark, out)
    assert removed == 1
    dirs = {os.path.basename(p) for p in glob.glob(out + "/docs/batch=*")}
    assert dirs == {"batch=-1", "batch=2"}
    after = sorted(
        map(tuple, ci.read_published(spark, out).drop("batch").collect())
    )
    assert after == before
    ci.process_corpus_batch(mk([(3, "totally novel words here now")]), 3, out)
    assert ci.read_published(spark, out).count() == 4


def test_corpus_ingest_batch_boundary_invariance(spark, tmp_path):
    """The module's central claim, pinned directly: chopping the same
    doc stream into one batch vs three yields the IDENTICAL published
    set (the dominated-by-earlier rule is a pure function of doc order
    and pairwise signatures)."""
    import pandas as pd

    from timeseries_db_spark.streaming import corpus_ingest as ci

    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta epsilon"),      # dup of 0
        (2, "one two three four five"),
        (3, "one two three four five six"),          # near 2
        (4, "red orange yellow green blue"),
        (5, "alpha beta gamma delta epsilon"),       # dup of 0 again
    ]
    mk = lambda rs: spark.createDataFrame(
        pd.DataFrame(rs, columns=["doc_id", "text"])
    )
    one = str(tmp_path / "one")
    ci.process_corpus_batch(mk(rows), 0, one)
    three = str(tmp_path / "three")
    ci.process_corpus_batch(mk(rows[:2]), 0, three)
    ci.process_corpus_batch(mk(rows[2:4]), 1, three)
    ci.process_corpus_batch(mk(rows[4:]), 2, three)
    a = {r["doc_id"] for r in ci.read_published(spark, one).collect()}
    b = {r["doc_id"] for r in ci.read_published(spark, three).collect()}
    assert a == b
    assert 0 in a and 1 not in a and 5 not in a  # dups suppressed


def test_warc_streaming_quality_gate(spark, tmp_path):
    """r13: the Gopher quality gate composed into the streaming WARC
    ingest — extract → clean → quality-filter → dedup → publish as ONE
    query. A bullet-ridden duplicate-line page is diverted to the lowq
    dead-letter table WITH its metric row and never reaches the
    signature index; the prose page publishes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseries_db_spark.operators import warc as W
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import warc_ingest as wi

    GOOD = (
        "Plenty of ordinary prose flows through this paragraph with "
        "many distinct words carrying actual meaning for readers."
    )
    BAD_HTML = (
        "<p>- bullet one</p><p>- bullet two</p><p>- bullet three</p>"
        "<p>dup line</p><p>dup line</p>"
    )

    def page(body_html: str) -> bytes:
        return W.http_response_block(
            f"<html><body>{body_html}</body></html>".encode()
        )

    payload = W.warc_build(
        [
            ("warcinfo", "", b"x"),
            ("response", "http://e/good", page(f"<p>{GOOD}</p>")),
            ("response", "http://e/bad", page(BAD_HTML)),
        ]
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    path = str(in_dir / "w0.parquet")
    pq.write_table(
        pa.table(
            {
                "asset_id": pa.array([0], pa.int64()),
                "kind": pa.array(["warc"]),
                "payload": pa.array([payload], pa.binary()),
            }
        ),
        path,
    )
    os.utime(path, (1_700_000_000, 1_700_000_000))
    out_dir = str(tmp_path / "out")
    thresholds = {
        "min_words": 8,
        "min_mean_word_len": 2.0,
        "max_bullet_frac": 0.3,
        "max_dup_line_frac": 0.15,
    }
    q = wi.start_warc_corpus_ingest(
        wi.read_warc_stream(spark, str(in_dir)),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,
        quality=thresholds,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    assert list(pub) == [1] and pub[1] == GOOD
    lowq = wi.read_lowq(spark, out_dir).collect()
    assert len(lowq) == 1
    row = lowq[0]
    # the diverted page carries its metric row: HTML extraction
    # collapses the blocks to ONE whitespace-joined line that starts
    # with a bullet — bullet_frac 1.0 trips the 0.3 gate
    assert row["doc_id"] == 2
    assert row["bullet_frac"] == 1.0
    assert row["n_words"] == 13
    # the plain (non-quarantine) path also honors the gate
    out2 = str(tmp_path / "out2")
    q2 = wi.start_warc_corpus_ingest(
        wi.read_warc_stream(spark, str(in_dir)),
        out2,
        str(tmp_path / "ckpt2"),
        quality=thresholds,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert [
        r["doc_id"] for r in ci.read_published(spark, out2).collect()
    ] == [1]


def test_warc_streaming_survives_poisoned_batch(spark, tmp_path):
    """r13 (VERDICT item 1): a micro-batch containing a damaged WARC
    file (junk gzip member mid-stream) and dirty records (404 body,
    revisit) does NOT kill the streaming query — the corrupt record is
    quarantined executor-side, the error/redirect bodies never reach
    the corpus, and the good records (including ones AFTER the
    corruption, and the whole next batch) publish normally."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseries_db_spark.operators import warc as W
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import warc_ingest as wi

    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "one two three four five six seven eight nine ten"

    def page(text: str, status: int = 200) -> bytes:
        return W.http_response_block(
            f"<html><body><p>{text}</p></body></html>".encode(),
            status=status,
        )

    # asset 0 (batch 0): good X, then a JUNK gzip member, then good Y
    # AFTER the corruption, then a 404 and a revisit record
    poisoned = (
        W.gzip_member(
            W.warc_build([("warcinfo", "", b"x")])
            + W.warc_build([("response", "http://e/x", page(X))])
        )
        + b"XXJUNKXX" * 4
        + W.gzip_member(W.warc_build([("response", "http://e/y", page(Y))]))
        + W.gzip_member(
            W.warc_build(
                [("response", "http://e/404", page("error body", 404))]
            )
        )
        + W.gzip_member(
            W.warc_build(
                [
                    (
                        "revisit",
                        "http://e/rev",
                        b"HTTP/1.1 200 OK\r\n\r\n",
                        ["WARC-Payload-Digest: sha1:Z"],
                    )
                ]
            )
        )
    )
    # asset 1 (batch 1): clean file, fresh text
    Z = "red orange yellow green blue indigo violet umber ochre teal"
    clean = W.warc_build(
        [("warcinfo", "", b"x"), ("response", "http://e/z", page(Z))]
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, (aid, payload) in enumerate([(0, poisoned), (1, clean)]):
        path = str(in_dir / f"w{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "asset_id": pa.array([aid], pa.int64()),
                    "kind": pa.array(["warc"]),
                    "payload": pa.array([payload], pa.binary()),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = str(tmp_path / "out")
    q = wi.start_warc_corpus_ingest(
        wi.read_warc_stream(spark, str(in_dir), max_files_per_trigger=1),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,  # r13: dead-letter channel rides the same query
    )
    try:
        q.processAllAvailable()  # would raise StreamingQueryException pre-r13
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    # poisoned file: records surface as error(-1)/X(1)/Y(2)/404(3)/rev(4);
    # only the clean 200 pages publish — X at rec 1, Y at rec 2 — and
    # batch 1's doc at asset 1 rec 1
    assert pub == {1: X, 2: Y, 1001: Z}
    # the dead-letter table carries exactly the excluded records with
    # their reasons: one gzip-member parse error + the 404 page
    rej = sorted(
        (r["rec_type"], r["uri"], r["status"], r["err"] or "")
        for r in wi.read_rejects(spark, out_dir).collect()
    )
    assert len(rej) == 2
    assert rej[0][0] == "error" and "magic" in rej[0][3]
    assert rej[1] == ("response", "http://e/404", 404, "")
    # batch column present (idempotent per-batch partition layout);
    # the clean batch 1 contributes no reject rows
    assert set(
        r["batch"] for r in wi.read_rejects(spark, out_dir).collect()
    ) == {0}


def test_archive_streaming_survives_poisoned_batch(spark, tmp_path):
    """r14 (VERDICT item 4): archives as the streaming arrival unit —
    a micro-batch containing a poisoned tarball (bad member CRC / junk
    container) does NOT kill the query: the damage lands in the
    dead-letter table, the poisoned archive's good members AND the
    whole next batch publish, and non-text members (a PNG) never reach
    the corpus."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseries_db_spark.operators import archive as A
    from timeseries_db_spark.operators.multimodal import png_encode
    from timeseries_db_spark.streaming import archive_ingest as ai
    from timeseries_db_spark.streaming import corpus_ingest as ci

    X = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Y = "one two three four five six seven eight nine ten"
    Z = "red orange yellow green blue indigo violet umber ochre teal"
    png = png_encode(bytes([7]) * 16, 4, 4, 1)
    # asset 0 (batch 0): zip whose SECOND member's CD CRC is flipped —
    # doc.txt (idx 0) and late.txt survive, bad.bin quarantines
    z = bytearray(
        A.zip_build(
            [("doc.txt", X.encode()), ("bad.bin", b"POISON"),
             ("late.txt", Y.encode()), ("img.png", png)],
            deflate=False,
        )
    )
    z[bytes(z).rfind(b"bad.bin") - 30] ^= 0xFF
    # asset 1 (batch 0): junk container — whole-asset quarantine
    # asset 2 (batch 1): clean tar
    clean = A.tar_build([("z.txt", Z.encode()), ("img.png", png)])
    batches = [[(0, bytes(z)), (1, b"JUNK" * 200)], [(2, clean)]]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate(batches):
        path = str(in_dir / f"a{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "asset_id": pa.array([r[0] for r in rows], pa.int64()),
                    "kind": pa.array(["archive"] * len(rows)),
                    "payload": pa.array(
                        [r[1] for r in rows], pa.binary()
                    ),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = str(tmp_path / "out")
    q = ai.start_archive_corpus_ingest(
        ai.read_archive_stream(spark, str(in_dir), max_files_per_trigger=1),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    # doc.txt = member 0 of asset 0; late.txt slides to member idx 1
    # (bad.bin never enumerates); z.txt = member 0 of asset 2
    assert pub == {0: X, 1: Y, 2000: Z}
    rej = ai.read_archive_rejects(spark, out_dir).collect()
    by_asset = {}
    for r in rej:
        by_asset.setdefault(r["asset_id"], []).append(r["err"])
    assert set(by_asset) == {0, 1}
    assert any("CRC" in e for e in by_asset[0])
    assert all(r["batch"] == 0 for r in rej)


def test_avro_streaming_survives_poisoned_block(spark, tmp_path):
    """r15 (VERDICT item 5): Avro drops as the streaming arrival unit
    — a micro-batch whose .avro shard carries a corrupt BLOCK does not
    kill the query: the block's error lands in the dead-letter table,
    its sibling blocks in the SAME file publish, a junk container
    costs one reject, and the next batch is untouched."""
    import hashlib
    import json
    import os

    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.streaming import avro_ingest as vi
    from timeseries_db_spark.streaming import corpus_ingest as ci

    texts = {
        i: f"document number {i} with some unique words w{i} x{i * 7}"
        for i in range(30)
    }
    recs = [{"doc_id": i, "text": texts[i]} for i in range(30)]
    shard = AV.avro_build(
        recs, AV.CORPUS_AVRO_SCHEMA, codec="deflate", block_records=10
    )
    # replace block 1's payload with varint-continuation junk (framing
    # consistent, trailing sync intact): records 10..19 quarantine
    sync = hashlib.md5(
        json.dumps(AV.CORPUS_AVRO_SCHEMA).encode()
    ).digest()
    at = shard.find(sync) + 16
    bounds = []
    while at < len(shard):
        c, a2 = AV._zigzag_decode(shard, at)
        s, a3 = AV._zigzag_decode(shard, a2)
        bounds.append((at, c, s, a3))
        at = a3 + s + 16
    b_at, cnt, sz, pay = bounds[1]
    junk = b"\x80" * 26
    poisoned = (
        shard[:b_at]
        + AV._zigzag_encode(cnt)
        + AV._zigzag_encode(len(junk))
        + junk
        + sync
        + shard[pay + sz + 16 :]
    )
    late = [
        {"doc_id": 100 + i, "text": f"late arrival text {i} y{i * 13}"}
        for i in range(5)
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    files = [
        ("a0.avro", poisoned),
        ("a1.avro", b"NOTAVRO" * 10),  # junk container, same batch dir
        ("a2.avro", AV.avro_build(late, AV.CORPUS_AVRO_SCHEMA,
                                  codec="snappy")),
    ]
    for i, (name, payload) in enumerate(files):
        p = str(in_dir / name)
        with open(p, "wb") as f:
            f.write(payload)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = str(tmp_path / "out")
    q = vi.start_avro_corpus_ingest(
        vi.read_avro_file_stream(spark, str(in_dir), max_files_per_trigger=1),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    want = {i: texts[i] for i in range(30) if not 10 <= i < 20}
    want.update({100 + i: t["text"] for i, t in enumerate(late)})
    assert pub == want
    rej = vi.read_avro_rejects(spark, out_dir).collect()
    assert len(rej) == 2
    errs = sorted(r["err"] for r in rej)
    assert "block" in errs[0] and "container" in errs[1]
    # the block reject names the poisoned file, the container reject
    # the junk one
    assert any(r["path"].endswith("a0.avro") and "block" in r["err"]
               for r in rej)
    assert any(r["path"].endswith("a1.avro") for r in rej)


def test_csv_streaming_quarantines_broken_lines(spark, tmp_path):
    """r15: CSV exports as the streaming arrival unit — the line-record
    quarantine projection (shared with the batch reader) runs under
    the streaming query: quoted commas/doubled quotes in text survive,
    header lines drop per shard, type-broken lines dead-letter with
    their raw text, and the next batch is untouched."""
    import os

    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import csv_ingest as xi

    t0 = 'first doc, with a comma and a "quote" inside'
    t1 = "plain second document body here"
    t2 = "third document arrives later entirely"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    shard0 = (
        "doc_id,text,lang,source,n_chars\n"
        f'0,"first doc, with a comma and a ""quote"" inside",en,web,{len(t0)}\n'
        f"1,{t1},en,web,{len(t1)}\n"
        "9,broken row,en,web,NOPE\n"
    )
    shard1 = (
        "doc_id,text,lang,source,n_chars\n"
        f"2,{t2},en,web,{len(t2)}\n"
    )
    for i, body in enumerate((shard0, shard1)):
        p = str(in_dir / f"c{i}.csv")
        with open(p, "w") as f:
            f.write(body)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = str(tmp_path / "out")
    q = xi.start_csv_corpus_ingest(
        xi.read_csv_line_stream(spark, str(in_dir), max_files_per_trigger=1),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    assert pub == {0: t0, 1: t1, 2: t2}
    rej = xi.read_csv_rejects(spark, out_dir).collect()
    assert len(rej) == 1
    assert rej[0]["line"].startswith("9,broken row") and rej[0]["batch"] == 0


def test_jsonl_streaming_quarantines_broken_lines(spark, tmp_path):
    """r15: JSONL shards as the streaming arrival unit — the batch
    reader's from_json quarantine projection under a streaming query:
    clean docs publish across batches, malformed JSON dead-letters
    with its raw line, blank lines are separators (never phantom
    docs)."""
    import os

    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import jsonl_ingest as ji

    shard0 = (
        '{"doc_id": 0, "text": "streamed jsonl body zero"}\n'
        "\n"
        '{"doc_id": 1, "text": "streamed jsonl body one"}\n'
        '{"doc_id": 9, "text": BROKEN}\n'
    )
    shard1 = '{"doc_id": 2, "text": "later arrival two"}\n'
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, body in enumerate((shard0, shard1)):
        p = str(in_dir / f"j{i}.jsonl")
        with open(p, "w") as f:
            f.write(body)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = str(tmp_path / "out")
    q = ji.start_jsonl_corpus_ingest(
        ji.read_jsonl_line_stream(
            spark, str(in_dir), max_files_per_trigger=1
        ),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    assert pub == {
        0: "streamed jsonl body zero",
        1: "streamed jsonl body one",
        2: "later arrival two",
    }
    rej = ji.read_jsonl_rejects(spark, out_dir).collect()
    assert len(rej) == 1
    assert "BROKEN" in rej[0]["line"] and rej[0]["batch"] == 0


def test_archive_of_avro_shards_streams_to_corpus(spark, tmp_path):
    """r15: a TARBALL OF .avro SHARDS as the arrival unit — members
    route by magic, records decode with their own doc ids, a corrupt
    block inside a member dead-letters (member_idx -2) while its
    sibling blocks and the plain-text member still publish."""
    import hashlib
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseries_db_spark.operators import archive as A
    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.streaming import archive_ingest as ai
    from timeseries_db_spark.streaming import corpus_ingest as ci

    recs = [
        {"doc_id": 100 + i, "text": f"avro member doc {i} q{i * 3}"}
        for i in range(20)
    ]
    shard = AV.avro_build(
        recs, AV.CORPUS_AVRO_SCHEMA, codec="null", block_records=10
    )
    # poison block 1 (records 110..119): junk payload, framing intact
    sync = hashlib.md5(
        json.dumps(AV.CORPUS_AVRO_SCHEMA).encode()
    ).digest()
    at = shard.find(sync) + 16
    c0, a2 = AV._zigzag_decode(shard, at)
    s0, a3 = AV._zigzag_decode(shard, a2)
    b1_at = a3 + s0 + 16
    c1, b2 = AV._zigzag_decode(shard, b1_at)
    s1, b3 = AV._zigzag_decode(shard, b1_at + (b2 - b1_at))
    junk = b"\x80" * 26
    poisoned = (
        shard[:b1_at]
        + AV._zigzag_encode(c1)
        + AV._zigzag_encode(len(junk))
        + junk
        + sync
        + shard[b3 + s1 + 16 :]
    )
    tar = A.tar_build(
        [("part-0.avro", poisoned), ("note.txt", b"plain text member")]
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    path = str(in_dir / "a0.parquet")
    pq.write_table(
        pa.table(
            {
                "asset_id": pa.array([5], pa.int64()),
                "kind": pa.array(["archive"]),
                "payload": pa.array([tar], pa.binary()),
            }
        ),
        path,
    )
    out_dir = str(tmp_path / "out")
    q = ai.start_archive_corpus_ingest(
        ai.read_archive_stream(spark, str(in_dir)),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,
        include_avro=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    want = {
        100 + i: f"avro member doc {i} q{i * 3}"
        for i in range(20)
        if not (10 <= i < 20)
    }
    # note.txt = member idx 1 of asset 5
    want[5 * 1000 + 1] = "plain text member"
    assert pub == want
    rej = ai.read_archive_rejects(spark, out_dir).collect()
    assert len(rej) == 1
    assert rej[0]["member_idx"] == -2 and "block" in rej[0]["err"]


def test_mixed_arrival_one_query_routes_and_isolates(spark, tmp_path):
    """r16 (VERDICT item 2): ONE streaming query over a mixed landing
    directory (.avro + .csv + .jsonl + an unrouted extension) routes
    each format to its OWN corpus-ingest state: per-format near-dup
    isolation (a cross-format duplicate text publishes in BOTH
    formats), same-batch domination stays doc_id-ordered within a
    format, per-format dead-letter channels land, and the unrouted
    file is simply left alone."""
    import os

    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.streaming import avro_ingest as vi
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import csv_ingest as xi
    from timeseries_db_spark.streaming import jsonl_ingest as ji
    from timeseries_db_spark.streaming import mixed_ingest as mi

    dup = "completely identical long body shared across formats " * 3
    near_a = "the quick brown fox jumps over twelve lazy dogs daily " * 3
    near_b = near_a + "tail"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "a0.avro", "wb") as f:
        f.write(
            AV.avro_build(
                [
                    {"doc_id": 5, "text": near_a},
                    {"doc_id": 6, "text": near_b},  # dominated by 5
                    {"doc_id": 7, "text": dup},
                ],
                AV.CORPUS_AVRO_SCHEMA,
            )
        )
    with open(in_dir / "c0.csv", "w") as f:
        f.write(
            "doc_id,text,lang,source,n_chars\n"
            f"50,{dup},en,web,{len(dup)}\n"
            "51,broken row,en,web,NOPE\n"
        )
    with open(in_dir / "j0.jsonl", "w") as f:
        f.write(
            '{"doc_id": 90, "text": "streamed jsonl body"}\n'
            '{"doc_id": 91, "text": TRUNC}\n'
        )
    with open(in_dir / "readme.bin", "wb") as f:
        f.write(b"\x00nobody routes this\x00")
    out_root = str(tmp_path / "out")
    q = mi.start_mixed_corpus_ingest(
        mi.read_mixed_file_stream(spark, str(in_dir)),
        out_root,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    avro_pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(
            spark, os.path.join(out_root, "avro")
        ).collect()
    }
    # 6 is a same-batch near-dup of 5 (smaller id wins); 7 publishes
    # even though csv doc 50 carries the IDENTICAL text — the states
    # are format-isolated
    assert avro_pub == {5: near_a, 7: dup}
    csv_pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(
            spark, os.path.join(out_root, "csv")
        ).collect()
    }
    assert csv_pub == {50: dup}
    jsl_pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(
            spark, os.path.join(out_root, "jsonl")
        ).collect()
    }
    assert jsl_pub == {90: "streamed jsonl body"}
    assert (
        vi.read_avro_rejects(spark, os.path.join(out_root, "avro")).count()
        == 0
    )
    rej = xi.read_csv_rejects(spark, os.path.join(out_root, "csv")).collect()
    assert len(rej) == 1 and rej[0]["line"].startswith("51,broken row")
    rej = ji.read_jsonl_rejects(
        spark, os.path.join(out_root, "jsonl")
    ).collect()
    assert len(rej) == 1 and "TRUNC" in rej[0]["line"]
    # the unrouted file is untouched in the landing dir
    assert (in_dir / "readme.bin").read_bytes().startswith(b"\x00nobody")


def test_avro_streaming_decodes_under_reader_schema(spark, tmp_path):
    """r16: schema evolution on the STREAMING path — a stream fed by
    shards written under the years-old v1 schema AND v2-native shards
    ingests uniformly under one pinned reader schema (alias rename,
    int→long promotion, default fill all apply per record); a shard
    whose writer schema cannot resolve dead-letters at container
    granularity while its siblings publish."""
    import os

    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.streaming import avro_ingest as vi
    from timeseries_db_spark.streaming import corpus_ingest as ci

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    v1 = [
        {"doc_id": i, "body": f"evolved streaming doc {i} w{i * 3}",
         "score": i, "legacy_blob": b"\x00"}
        for i in range(10)
    ]
    with open(in_dir / "a0.avro", "wb") as f:
        f.write(AV.avro_build(v1, AV.CORPUS_V1_AVRO_SCHEMA))
    v2 = [
        {"doc_id": 100 + i, "text": f"native v2 doc {i} z{i * 7}",
         "score": i, "lang": "en"}
        for i in range(5)
    ]
    with open(in_dir / "a1.avro", "wb") as f:
        f.write(AV.avro_build(v2, AV.CORPUS_V2_READER_SCHEMA))
    with open(in_dir / "a2.avro", "wb") as f:  # unresolvable writer
        f.write(
            AV.avro_build(
                [{"doc_id": -5}],
                {"type": "record", "name": "document",
                 "fields": [{"name": "doc_id", "type": "long"}]},
            )
        )
    for i, name in enumerate(("a0.avro", "a1.avro", "a2.avro")):
        p = str(in_dir / name)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    out_dir = str(tmp_path / "out")
    q = vi.start_avro_corpus_ingest(
        vi.read_avro_file_stream(spark, str(in_dir)),
        out_dir,
        str(tmp_path / "ckpt"),
        quarantine=True,
        reader_schema=AV.CORPUS_V2_READER_SCHEMA,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(spark, out_dir).collect()
    }
    want = {r["doc_id"]: r["body"] for r in v1}
    want.update({r["doc_id"]: r["text"] for r in v2})
    assert pub == want
    rej = vi.read_avro_rejects(spark, out_dir).collect()
    assert len(rej) == 1
    assert rej[0]["path"].endswith("a2.avro")
    assert "no writer counterpart" in rej[0]["err"]


def test_read_corpus_any_avro_reader_schema(spark, tmp_path):
    """r16: the batch corpus reader accepts ``reader_schema`` too —
    mixed writer-version directories read uniformly."""
    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.sources.avro import read_corpus_avro

    d = tmp_path / "corpus"
    d.mkdir()
    with open(d / "old.avro", "wb") as f:
        f.write(
            AV.avro_build(
                [{"doc_id": 1, "body": "old-style body", "score": 7,
                  "legacy_blob": b"z"}],
                AV.CORPUS_V1_AVRO_SCHEMA,
            )
        )
    got = read_corpus_avro(
        spark, str(d), reader_schema=AV.CORPUS_V2_READER_SCHEMA
    ).collect()
    assert [(r["doc_id"], r["text"], r["_corrupt"]) for r in got] == [
        (1, "old-style body", None)
    ]


def test_mixed_arrival_routes_sobj_and_sz(spark, tmp_path):
    """r16 late: the mixed-arrival query also routes single-object
    segments (.sobj) and snappy-framed shards (.sz) — per-format
    states, registry-resolved messages, CRC-rejected chunks
    dead-lettering while clean shards publish."""
    import os

    from timeseries_db_spark.functions import snappy as S
    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.streaming import avro_ingest as vi
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import jsonl_ingest as ji
    from timeseries_db_spark.streaming import mixed_ingest as mi

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "k0.sobj").write_bytes(
        AV.single_object_encode(
            [{"doc_id": 3, "text": "sobj streamed body"}],
            AV.CORPUS_AVRO_SCHEMA,
        )
        + b"\x00junk between messages"  # marker-missing tail: 1 reject
    )
    (in_dir / "z0.sz").write_bytes(
        S.snappy_framed_compress(
            b'{"doc_id": 8, "text": "sz streamed body"}\n'
        )
    )
    flipped = bytearray(
        S.snappy_framed_compress(b'{"doc_id": 9, "text": "lost"}\n')
    )
    flipped[14] ^= 0x01
    (in_dir / "z1.sz").write_bytes(bytes(flipped))
    out_root = str(tmp_path / "out")
    q = mi.start_mixed_corpus_ingest(
        mi.read_mixed_file_stream(spark, str(in_dir)),
        out_root,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sobj_pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(
            spark, os.path.join(out_root, "sobj")
        ).collect()
    }
    assert sobj_pub == {3: "sobj streamed body"}
    rej = vi.read_avro_rejects(
        spark, os.path.join(out_root, "sobj")
    ).collect()
    assert len(rej) == 1 and "marker missing" in rej[0]["err"]
    sz_pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(
            spark, os.path.join(out_root, "sz")
        ).collect()
    }
    assert sz_pub == {8: "sz streamed body"}
    rej = ji.read_jsonl_rejects(
        spark, os.path.join(out_root, "sz")
    ).collect()
    assert len(rej) == 1 and "sz corrupt" in rej[0]["line"]


def test_mixed_arrival_routes_cwire(spark, tmp_path):
    """r17: the mixed query routes Confluent-wire segments (.cwire)
    when a registry snapshot is configured — id-resolved messages
    publish into their own channel, an unknown-id message
    dead-letters; without a registry the files stay untouched (the
    unrouted-extension posture)."""
    import os

    from timeseries_db_spark.sources import avro as AV
    from timeseries_db_spark.streaming import avro_ingest as vi
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import mixed_ingest as mi

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "k0.cwire").write_bytes(
        AV.confluent_encode(
            [{"doc_id": 4, "text": "cwire streamed body"}],
            AV.CORPUS_AVRO_SCHEMA,
            12,
        )
        + AV.confluent_encode(
            [{"doc_id": 5, "text": "alien"}], AV.CORPUS_AVRO_SCHEMA, 99
        )
    )
    out_root = str(tmp_path / "out")
    q = mi.start_mixed_corpus_ingest(
        mi.read_mixed_file_stream(spark, str(in_dir)),
        out_root,
        str(tmp_path / "ckpt"),
        quarantine=True,
        cwire_registry={12: AV.CORPUS_AVRO_SCHEMA},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(
            spark, os.path.join(out_root, "cwire")
        ).collect()
    }
    assert pub == {4: "cwire streamed body"}
    rej = vi.read_avro_rejects(
        spark, os.path.join(out_root, "cwire")
    ).collect()
    assert len(rej) == 1 and "99 not in registry" in rej[0]["err"]

    # no registry: .cwire is an unrouted extension — nothing written
    out2 = str(tmp_path / "out2")
    q = mi.start_mixed_corpus_ingest(
        mi.read_mixed_file_stream(spark, str(in_dir)),
        out2,
        str(tmp_path / "ckpt2"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert not os.path.exists(os.path.join(out2, "cwire"))


def test_mixed_arrival_compound_suffix_routing(spark, tmp_path):
    """r17 (VERDICT item 5): the mixed query routes on the COMPOUND
    suffix — a ``.csv.gz`` / ``.csv.sz`` shard decompresses with the
    wrapper's kernel and publishes through the CSV closed form into
    its own ``csv_gz/`` / ``csv_sz/`` channel (previously it routed
    to the wrapper channel, was parsed as JSONL, and every line
    dead-lettered). Bare ``.gz``/``.sz`` and ``.jsonl.gz`` keep the
    legacy JSONL wrapper channels, and format isolation holds: the
    same doc_id published via .csv.gz does not suppress the .jsonl.gz
    copy."""
    import gzip
    import os

    from timeseries_db_spark.functions import snappy as S
    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import jsonl_ingest as ji
    from timeseries_db_spark.streaming import mixed_ingest as mi

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    csv_body = (
        b"doc_id,text,lang,source,n_chars\n"
        b'5,"gz csv body",en,web,11\n'
        b"not,a,valid,doc_id,row\n"
    )
    (in_dir / "a.csv.gz").write_bytes(gzip.compress(csv_body))
    (in_dir / "b.csv.sz").write_bytes(
        S.snappy_framed_compress(
            b"doc_id,text,lang,source,n_chars\n"
            b'6,"sz csv body",en,web,11\n'
        )
    )
    # same doc_id 5 via the JSONL wrapper channel: must publish too
    (in_dir / "c.jsonl.gz").write_bytes(
        gzip.compress(b'{"doc_id": 5, "text": "gz jsonl body"}\n')
    )
    out_root = str(tmp_path / "out")
    q = mi.start_mixed_corpus_ingest(
        mi.read_mixed_file_stream(spark, str(in_dir)),
        out_root,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        ch: {
            r["doc_id"]: r["text"]
            for r in ci.read_published(
                spark, os.path.join(out_root, ch)
            ).collect()
        }
        for ch in ("csv_gz", "csv_sz", "gz")
    }
    assert pub["csv_gz"] == {5: "gz csv body"}
    assert pub["csv_sz"] == {6: "sz csv body"}
    assert pub["gz"] == {5: "gz jsonl body"}  # isolation holds
    rej = ji.read_jsonl_rejects(
        spark, os.path.join(out_root, "csv_gz")
    ).collect()
    assert len(rej) == 1 and "not,a,valid" in rej[0]["line"]


def test_streaming_ivf_assignment_matches_batch(spark, tmp_path):
    """r16: streaming IVF index maintenance — arrivals assigned to the
    FROZEN quantizer across micro-batches equal the batch assignment
    of the same vectors exactly (same rounded-cosine / centroid-id
    tie-break), and list_growth counts per-list arrivals."""
    import os

    from timeseries_db_spark.operators import similarity as sim
    from timeseries_db_spark.streaming import ivf_maintain as im

    corpus = spark.range(200).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 7), j -> cast((id * 31 + j * 7) % 13 - 6"
        " as float)) AS embedding",
    )
    cents = sim.ivf_centroids(corpus, nlist=16)
    batch_assign = {
        r["vec_id"]: r["list_id"]
        for r in sim.ivf_assign_with_vectors(spark, corpus, cents)
        .select("vec_id", "list_id")
        .collect()
    }
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for k, pred in enumerate(("vec_id < 100", "vec_id >= 100")):
        tmp = str(tmp_path / f"tmp{k}")
        corpus.filter(pred).coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        os.rename(os.path.join(tmp, part), str(in_dir / f"s{k}.parquet"))
    out_dir = str(tmp_path / "out")
    q = im.start_ivf_assign_ingest(
        im.read_embedding_stream(spark, str(in_dir), max_files_per_trigger=1),
        cents,
        out_dir,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r["vec_id"]: r["list_id"]
        for r in im.read_assignments(spark, out_dir).collect()
    }
    assert streamed == batch_assign
    growth = {
        r["list_id"]: r["n_new"]
        for r in im.list_growth(spark, out_dir).collect()
    }
    assert sum(growth.values()) == 200
    want = {}
    for lid in batch_assign.values():
        want[lid] = want.get(lid, 0) + 1
    assert growth == want


def test_mixed_arrival_gz_route_discards_unverified_partials(spark, tmp_path):
    """r16 late: .jsonl.gz through the mixed query — complete members
    of a multi-member (pigz-shape) shard publish even when a LATER
    member is truncated; the truncated member's partial inflate output
    is DISCARDED (gzip verifies only at its CRC-32 trailer, so partial
    output is unverified bytes) and the shard dead-letters one
    sentinel."""
    import gzip
    import os

    from timeseries_db_spark.streaming import corpus_ingest as ci
    from timeseries_db_spark.streaming import jsonl_ingest as ji
    from timeseries_db_spark.streaming import mixed_ingest as mi

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    good = gzip.compress(b'{"doc_id": 1, "text": "gz member one"}\n')
    cut = gzip.compress(
        b'{"doc_id": 2, "text": "partial never published"}\n' * 30
    )
    (in_dir / "m.jsonl.gz").write_bytes(good + cut[: len(cut) // 2])
    out_root = str(tmp_path / "out")
    q = mi.start_mixed_corpus_ingest(
        mi.read_mixed_file_stream(spark, str(in_dir)),
        out_root,
        str(tmp_path / "ckpt"),
        quarantine=True,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pub = {
        r["doc_id"]: r["text"]
        for r in ci.read_published(
            spark, os.path.join(out_root, "gz")
        ).collect()
    }
    assert pub == {1: "gz member one"}
    rej = ji.read_jsonl_rejects(spark, os.path.join(out_root, "gz")).collect()
    assert len(rej) == 1 and "gz corrupt" in rej[0]["line"]
