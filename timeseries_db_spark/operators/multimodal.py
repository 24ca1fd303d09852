"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual media decoding is STUBBED (no
image/audio libraries in this container): ``decode_image`` et al. either
run a clearly-marked deterministic fake (for pipeline tests) or raise
``NotImplementedError`` when ``fake=False``, which is where PIL/ffmpeg
would slot in.

Scale notes (100 TB of media):

* payloads stay ``binary`` columns in parquet — scans project metadata
  columns only until a stage actually needs bytes (column pruning keeps
  the 99%-of-bytes payload column unread for metadata-only queries);
* ``mapInPandas`` streams Arrow record batches — peak executor memory is
  one batch of payloads, not a partition; cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
  large (set small here to prove multi-batch behavior);
* feature extraction emits fixed-size vectors → goes straight into the
  ``operators/similarity`` ANN path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Asset table schema: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, n_bytes long, sha256 string"
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Deterministic asset fixture: document text bytes as fake payloads
    (the container has no media files; the pipeline shape is the test)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int]:
    """Deterministic fake: width/height derived from payload digest."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240


def decode_image_features(assets: DataFrame, *, fake: bool = True) -> DataFrame:
    """Per-image features via an Arrow-batched decode stage. With
    ``fake=False`` this is the PIL/turbojpeg insertion point."""
    if not fake:
        raise NotImplementedError(
            "real image decoding needs an image library (PIL/opencv) — "
            "not available in this container; run with fake=True"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            widths, heights, digests = [], [], []
            for payload in pdf["payload"]:
                w, h = _fake_decode_image(bytes(payload))
                widths.append(w)
                heights.append(h)
                digests.append(hashlib.sha256(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": widths,
                    "height": heights,
                    "n_bytes": pdf["payload"].map(len),
                    "sha256": digests,
                }
            )

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "payload")
        .mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)
    )


def resize_plan(assets: DataFrame, max_side: int = 64, *, fake: bool = True) -> DataFrame:
    """Aspect-preserving resize targets for every image asset: fit the
    longer side to ``max_side``, never upscale. Integer arithmetic only
    (``w*max_side // longest``) so the plan is bit-identical across
    engines; the actual pixel resampling is the stubbed decode stage."""
    feats = decode_image_features(assets, fake=fake)
    longest = "greatest(width, height)"
    return feats.select(
        "asset_id",
        "width",
        "height",
        F.expr(
            f"CAST(IF({longest} > {max_side},"
            f" (CAST(width AS BIGINT) * {max_side}) div {longest}, width) AS INT)"
        ).alias("target_w"),
        F.expr(
            f"CAST(IF({longest} > {max_side},"
            f" (CAST(height AS BIGINT) * {max_side}) div {longest}, height) AS INT)"
        ).alias("target_h"),
    )


def audio_chunk_plan(assets: DataFrame, chunk_ms: int = 5_000) -> DataFrame:
    """Audio chunking *plan*: expand each audio asset into fixed-duration
    chunk offsets to decode. Duration is faked deterministically from the
    payload (1 ms per byte); like the frame plan, the expansion is
    JVM-side ``sequence``/``explode`` — no Python until real decode."""
    return (
        assets.filter(F.col("kind") == "audio")
        .withColumn("dur_ms", F.length("payload").cast("long"))
        # sequence(0, -1) errors on empty payloads; zero chunks is right
        .filter(F.col("dur_ms") > 0)
        .select(
            "asset_id",
            "dur_ms",
            F.explode(
                F.sequence(F.lit(0), F.col("dur_ms") - 1, F.lit(chunk_ms))
            ).alias("off"),
        )
        .select(
            "asset_id",
            F.col("off").cast("long").alias("chunk_start_ms"),
            F.least(F.lit(chunk_ms), F.col("dur_ms") - F.col("off"))
            .cast("long")
            .alias("chunk_len_ms"),
        )
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video asset into frame
    indices to decode (the decode itself is the stubbed stage). Pure
    column ops — the expansion is JVM-side ``sequence``/``explode``.
    Frame count is faked from payload size (1 frame per 64 bytes)."""
    return (
        assets.filter(F.col("kind") == "video")
        .withColumn("n_frames", (F.length("payload") / 64).cast("int") + 1)
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("fi"),
        )
        .select("asset_id", F.col("fi").cast("long").alias("frame_idx"))
    )
