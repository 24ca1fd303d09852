"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. Decoding splits in two:

* **container/header metadata is decoded for real, pure-Python** — no
  media libraries needed: PNG/BMP/GIF/JPEG dimensions
  (:func:`image_meta`) and WAV channel/rate/duration
  (:func:`wav_meta`), via ``decode_image_features(fake=False)`` /
  :func:`decode_audio_features`;
* **pixel/sample decompression** (JPEG pixels, video frames) is the
  one genuinely library-bound stage and stays stubbed behind
  ``NotImplementedError`` — that is where PIL/ffmpeg slot in.

The registry's gate entries run the deterministic fake (the synthetic
fixture payloads are text bytes, not real media, and the DuckDB oracle
mirrors the fake), while pytest feeds the real decoders synthesized
PNG/BMP/GIF/JPEG/WAV bytes.

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


def image_meta(payload: bytes) -> tuple[str, int, int]:
    """REAL image metadata — (format, width, height) parsed straight
    from container headers, no decompression and no media library:

    * PNG: IHDR width/height, big-endian u32 at bytes 16-23;
    * GIF (87a/89a): logical-screen size, little-endian u16 at 6-9;
    * BMP: BITMAPINFOHEADER, little-endian i32 at 18-25 (negative
      height = top-down rows → abs);
    * JPEG: walk the marker segments to the first SOF frame header
      (skipping non-frame markers), height/width big-endian u16 at
      segment offsets 3-6.

    Raises ``ValueError`` on anything else — pixel decoding of an
    unknown container is the library-bound stage, not this one.
    """
    b = payload
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return "bmp", abs(w), abs(h)
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            # SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return "jpeg", w, h
            i += 2 + seg_len
        raise ValueError("JPEG without a SOF frame header")
    raise ValueError(f"unrecognized image container (magic {b[:8]!r})")


def decode_image_features(assets: DataFrame, *, fake: bool = True) -> DataFrame:
    """Per-image features via an Arrow-batched decode stage.

    ``fake=True`` (the fixture/gate default — the synthetic payloads are
    not real media) derives dimensions from the payload digest;
    ``fake=False`` parses the real container headers via
    :func:`image_meta`."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            widths, heights, digests = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if fake:
                    w, h = _fake_decode_image(raw)
                else:
                    _, w, h = image_meta(raw)
                widths.append(w)
                heights.append(h)
                digests.append(hashlib.sha256(raw).hexdigest())
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


AUDIO_FEATURES_SCHEMA = (
    "asset_id long, channels int, sample_rate int, bits int, duration_ms long"
)


def wav_meta(payload: bytes) -> tuple[int, int, int, int]:
    """REAL WAV (RIFF) metadata — (channels, sample_rate, bits,
    duration_ms) from the fmt/data chunks; pure header arithmetic, the
    PCM samples are never touched. Raises ``ValueError`` for non-WAV."""
    b = payload
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i = 12
    channels = rate = bits = None
    data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not channels or not rate or not bits or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    byte_rate = rate * channels * (bits // 8)
    return channels, rate, bits, (data_size * 1000) // byte_rate


def decode_audio_features(assets: DataFrame) -> DataFrame:
    """Per-audio-asset REAL header features for WAV payloads (see
    :func:`wav_meta`); compressed codecs (mp3/opus/…) would raise in the
    batch — that decompression is the ffmpeg insertion point."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [wav_meta(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "channels": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "bits": [r[2] for r in rows],
                    "duration_ms": [r[3] for r in rows],
                }
            )

    return (
        assets.filter(F.col("kind") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)
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
