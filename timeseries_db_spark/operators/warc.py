"""WARC (Web ARChive, ISO 28500 — the Common Crawl container) ingest:
the on-disk shape a web-scale training corpus actually arrives in.
A WARC file is a sequence of records — ``WARC/1.0`` version line,
``Name: value`` headers, ``Content-Length``-delimited block, blank-line
terminators — where ``response`` records carry a full HTTP message
whose body is the page.

The operators here parse that from spec (no library), then compose
with :mod:`timeseries_db_spark.operators.text`'s HTML extraction, so
the full Common-Crawl-style chain — WARC → HTTP body → HTML → text —
runs as one Arrow-batched, map-only Spark stage. At 100 TB each WARC
payload parses independently; parallelism is per-asset rows and
nothing leaves the executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.operators.text import html_to_text_str

_CRLF = "\r\n"


def warc_build(records: list[tuple[str, str, bytes]]) -> bytes:
    """Minimal WARC/1.0 writer (tests + fixtures): each record is
    ``(warc_type, target_uri, block)``; an empty ``target_uri`` omits
    the header (e.g. ``warcinfo``)."""
    out = bytearray()
    for wtype, uri, block in records:
        hdr = [f"WARC/1.0"]
        hdr.append(f"WARC-Type: {wtype}")
        if uri:
            hdr.append(f"WARC-Target-URI: {uri}")
        hdr.append(f"Content-Length: {len(block)}")
        out += (_CRLF.join(hdr) + _CRLF + _CRLF).encode("latin-1")
        out += block
        out += b"\r\n\r\n"
    return bytes(out)


def warc_records(payload: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Parse a WARC file into ``[(headers, block), ...]`` — version
    line checked per record, headers case-insensitively keyed
    (lowercase), blocks sliced by ``Content-Length`` exactly (binary-
    safe: the block is never scanned for terminators). Raises
    ``ValueError`` on structural damage."""
    b = payload
    out: list[tuple[dict[str, str], bytes]] = []
    i = 0
    n = len(b)
    while i < n:
        # tolerate inter-record padding blank lines
        while i < n and b[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not b.startswith(b"WARC/", i):
            raise ValueError(f"WARC record at {i} missing version line")
        hdr_end = b.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("WARC header block unterminated")
        lines = b[i:hdr_end].decode("latin-1").split(_CRLF)
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        clen = int(headers["content-length"])
        block_lo = hdr_end + 4
        if block_lo + clen > n:
            raise ValueError("WARC block truncated")
        out.append((headers, bytes(b[block_lo : block_lo + clen])))
        i = block_lo + clen
    return out


def http_body(block: bytes) -> bytes:
    """The message body of an HTTP response block (everything past the
    first blank line); a block with no header section is returned
    whole — permissive, like real crawl processors."""
    at = block.find(b"\r\n\r\n")
    return block if at < 0 else block[at + 4 :]


def warc_extract_text(assets: DataFrame) -> DataFrame:
    """(asset_id, rec_idx, uri, n_tags, n_entities, text) — one row per
    ``response`` record: WARC parse → HTTP body → HTML→text extraction
    (:func:`html_to_text_str`), all inside one ``mapInPandas`` stage.
    Non-response records (warcinfo, request, metadata) are skipped —
    they carry no page text."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                for ri, (hdrs, block) in enumerate(warc_records(bytes(payload))):
                    if hdrs.get("warc-type") != "response":
                        continue
                    text, n_tags, n_ent = html_to_text_str(
                        http_body(block).decode("utf-8", "replace")
                    )
                    rows.append(
                        (
                            int(asset_id),
                            ri,
                            hdrs.get("warc-target-uri", ""),
                            n_tags,
                            n_ent,
                            text,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "rec_idx", "uri", "n_tags", "n_entities", "text",
                ],
            )

    return (
        assets.filter(F.col("kind") == "warc")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, rec_idx long, uri string, n_tags long, "
            "n_entities long, text string",
        )
    )
