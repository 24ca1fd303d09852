"""PDF text extraction (r12): the other document container a real
training corpus is full of. Parsed from the ISO 32000 spec with
stdlib only — no library — for the subset that covers the vast
majority of machine-generated PDFs' text layer:

* **object scan**: ``N G obj … endobj`` bodies located by a direct
  scan (no xref needed for extraction — the xref table exists to make
  RANDOM access cheap; a full-text pass reads every object anyway,
  and real-world PDFs' xrefs are broken often enough that extractors
  scan as a matter of course).
* **streams**: ``<< dict >> stream … endstream``, sliced by
  ``/Length`` when it is a direct integer, else by the
  ``endstream`` delimiter; ``/FlateDecode`` inflated with ``zlib``
  (the overwhelmingly dominant filter for content streams).
* **content text operators**: a tokenizer over the decompressed
  content stream evaluates ``BT … ET`` text objects — ``Tj`` (show
  string), ``'`` and ``"`` (next-line show), and ``TJ`` (array show
  with kerning numbers, which are dropped); ``TD``/``Td``/``T*``
  break lines, other operators are skipped with their operands.
* **string syntax**: ``(…)`` literal strings with balanced nested
  parens, ``\\n \\r \\t \\b \\f \\( \\) \\\\`` escapes, 1-3 digit
  octal escapes, and line-continuation backslash; ``<hex>`` strings
  (whitespace-tolerant, odd final digit padded with 0). Bytes decode
  as PDFDocEncoding≈latin-1 for the ASCII range this subset targets.

Out of scope, raising ``ValueError`` with the capability name exactly
like the media codecs' seams: encrypted PDFs (``/Encrypt``), LZW and
DCT-filtered content, CID/Type0 composite fonts with multi-byte
encodings (a real deployment slots pdfminer/poppler in per payload —
the Spark plumbing is identical).

The writer half (:func:`pdf_build`) emits a minimal valid PDF
(catalog → pages → page → Flate or raw content stream + one Type1
font) and is the roundtrip pin for the extractor, the same
own-encoder-as-oracle pattern as the FLAC/ADPCM/GIF codecs.

At 100 TB this runs exactly like the other payload kernels: an
Arrow-batched ``mapInPandas`` over a projected binary column,
map-only, per-asset parallel, nothing leaving the executors.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _pdf_objects(payload: bytes) -> list[bytes]:
    """Every ``obj … endobj`` body, by direct scan."""
    out = []
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("PDF object unterminated")
        out.append(payload[m.end() : end])
    return out


def _stream_of(body: bytes) -> bytes | None:
    """The decoded stream of one object body (None when it has no
    stream): sliced by a direct /Length integer when present, else by
    the endstream delimiter; FlateDecode inflated."""
    at = body.find(b"stream")
    if at < 0:
        return None
    dict_part = body[:at]
    i = at + len(b"stream")
    # EOL after the `stream` keyword: CRLF or LF per spec
    if body[i : i + 2] == b"\r\n":
        i += 2
    elif body[i : i + 1] == b"\n":
        i += 1
    m = _LENGTH_RE.search(dict_part)
    if m:
        data = body[i : i + int(m.group(1))]
    else:  # indirect /Length reference: fall back to the delimiter
        end = body.find(b"endstream", i)
        if end < 0:
            raise ValueError("PDF stream unterminated")
        data = body[i:end].rstrip(b"\r\n")
    if b"/Filter" in dict_part:
        if b"/FlateDecode" in dict_part:
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"PDF FlateDecode failed: {e}") from e
        else:
            raise ValueError(
                "PDF filter outside PDF_CAPABILITIES (FlateDecode only; "
                "LZW/DCT/etc = pdfminer seam)"
            )
    return data


def _lit_string(s: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(…)`` literal string starting at the ``(``; returns
    (text, index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in b"nrtbf":
                out += {"n": b"\n", "r": b"\r", "t": b"\t",
                        "b": b"\b", "f": b"\x0c"}[chr(e)]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= s[i] <= 0x37:
                    oct_digits.append(s[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the backslash is dropped per spec
                out.append(e)
                i += 1
        elif c == 0x28:  # nested (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("PDF literal string unterminated")


def _hex_string(s: bytes, i: int) -> tuple[str, int]:
    """Parse a ``<…>`` hex string starting at the ``<``."""
    end = s.find(b">", i)
    if end < 0:
        raise ValueError("PDF hex string unterminated")
    digits = bytes(c for c in s[i + 1 : end] if c not in _WS)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("latin-1")).decode("latin-1"), end + 1


def _content_text(stream: bytes) -> tuple[str, int]:
    """Evaluate the text-showing operators of one content stream:
    returns (extracted text, n_show_ops). Text runs inside one BT/ET
    are joined as-is; ``TD``/``Td``/``T*``/``ET`` insert a line
    break (collapsed later)."""
    parts: list[str] = []
    n_shows = 0
    pending: list[str] = []  # operand stack (string operands only)
    i = 0
    n = len(stream)
    in_text = False

    def brk() -> None:
        if parts and parts[-1] != "\n":
            parts.append("\n")

    while i < n:
        c = stream[i]
        if c in _WS:
            i += 1
        elif c == 0x28:  # (
            txt, i = _lit_string(stream, i)
            pending.append(txt)
        elif c == 0x3C:  # < — hex string or << dict
            if stream[i : i + 2] == b"<<":
                i += 2
            else:
                txt, i = _hex_string(stream, i)
                pending.append(txt)
        elif c == 0x25:  # % comment to EOL
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x5B or c == 0x5D or stream[i : i + 2] == b">>":  # [ ] >>
            i += 2 if stream[i : i + 2] == b">>" else 1
        elif c == 0x2F:  # /name
            i += 1
            while i < n and stream[i] not in _WS and stream[i] not in _DELIM:
                i += 1
        else:  # number or operator token
            j = i
            while j < n and stream[j] not in _WS and stream[j] not in _DELIM:
                j += 1
            tok = stream[i:j]
            i = j
            if tok == b"BT":
                in_text = True
                brk()
                pending.clear()
            elif tok == b"ET":
                in_text = False
                brk()
                pending.clear()
            elif in_text and tok in (b"Tj", b"'", b'"'):
                if tok != b"Tj":
                    brk()  # ' and " move to the next line first
                if pending:
                    parts.append(pending[-1])
                    n_shows += 1
                pending.clear()
            elif in_text and tok == b"TJ":
                # array show: string operands concatenate, kerning
                # numbers (already skipped as non-string tokens) drop
                if pending:
                    parts.append("".join(pending))
                    n_shows += 1
                pending.clear()
            elif in_text and tok in (b"Td", b"TD", b"T*"):
                brk()
                pending.clear()
            elif tok and not (
                tok[0:1].isdigit() or tok[0:1] in (b"+", b"-", b".")
            ):
                pending.clear()  # any other OPERATOR consumes operands
    text = re.sub(r"[ \t]*\n[ \t\n]*", "\n", "".join(parts)).strip("\n")
    return text, n_shows


def pdf_text(payload: bytes) -> tuple[str, int, int]:
    """REAL PDF text extraction — (text, n_show_ops, n_streams): every
    content stream's BT/ET text operators evaluated in document order,
    page texts separated by newlines. Raises with the capability name
    for encrypted files and non-Flate filters."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in payload:
        raise ValueError(
            "encrypted PDF outside PDF_CAPABILITIES (pdfminer seam)"
        )
    texts: list[str] = []
    n_shows = 0
    n_streams = 0
    for body in _pdf_objects(payload):
        data = _stream_of(body)
        if data is None:
            continue
        n_streams += 1
        if b"BT" not in data:  # not a text-bearing content stream
            continue
        t, k = _content_text(data)
        n_shows += k
        if t:
            texts.append(t)
    return "\n".join(texts), n_shows, n_streams


def pdf_build(
    pages: list[list[str]], *, flate: bool = True, use_tj_array: bool = False
) -> bytes:
    """Minimal valid PDF writer (tests + fixtures): one content stream
    per page, each inner list one text line (``Td``-positioned ``Tj``
    shows — or a kerned ``TJ`` array per line with ``use_tj_array``),
    a Type1 /Helvetica font, optional FlateDecode. The extractor's
    roundtrip pin."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1")

    objs: list[bytes] = []
    page_ids = [4 + 2 * i for i in range(len(pages))]
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, lines in enumerate(pages):
        shows = []
        for ln in lines:
            if use_tj_array:
                # split into kerned halves: [(ab) -120 (cd)] TJ
                half = len(ln) // 2
                shows.append(
                    b"[(" + esc(ln[:half]) + b") -120 ("
                    + esc(ln[half:]) + b")] TJ T*"
                )
            else:
                shows.append(b"(" + esc(ln) + b") Tj T*")
        content = (
            b"BT /F1 12 Tf 72 720 Td 14 TL\n" + b"\n".join(shows) + b"\nET"
        )
        if flate:
            content = zlib.compress(content)
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {page_ids[i] + 1} 0 R >>".encode()
        )
        objs.append(
            (
                f"<< /Length {len(content)}"
                + (" /Filter /FlateDecode" if flate else "")
                + " >>\nstream\n"
            ).encode()
            + content
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_extract_text(assets: DataFrame) -> DataFrame:
    """(asset_id, n_shows, n_streams, text) — :func:`pdf_text` over
    PDF assets, Arrow-batched, map-only (the standard payload-kernel
    posture)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            if not len(pdf_batch):
                continue
            rows = []
            for asset_id, payload in zip(
                pdf_batch["asset_id"], pdf_batch["payload"]
            ):
                text, n_shows, n_streams = pdf_text(bytes(payload))
                rows.append((int(asset_id), n_shows, n_streams, text))
            yield pd.DataFrame(
                rows, columns=["asset_id", "n_shows", "n_streams", "text"]
            )

    return (
        assets.filter(F.col("kind") == "pdf")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, n_shows long, n_streams long, text string",
        )
    )
