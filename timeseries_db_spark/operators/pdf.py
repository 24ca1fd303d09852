"""PDF text extraction (r12): the other document container a real
training corpus is full of. Parsed from the ISO 32000 spec with
stdlib only — no library — for the subset that covers the vast
majority of machine-generated PDFs' text layer:

* **object directory** (r13): the XREF WALK — classic tables and
  PDF-1.5 xref streams (``/Type /XRef``, ``/W`` binary rows),
  ``/Prev`` incremental-update chains, and ``/Type /ObjStm`` object
  streams expanded into their member objects — with a direct ``N G
  obj … endobj`` scan as the fallback for the damaged xrefs
  real-world files are full of (extractors scan as a matter of
  course).
* **streams**: ``<< dict >> stream … endstream``, sliced by
  ``/Length`` when it is a direct integer or (r13) resolvable
  indirect reference (``N G R`` — often an integer living in an
  object stream), else by the ``endstream`` delimiter;
  ``/FlateDecode`` inflated with ``zlib`` (the overwhelmingly
  dominant content filter), ``/LZWDecode`` (r13) decoded by the
  repo's TIFF-variant LZW — ISO 32000 §7.4.4 is the same MSB-first
  early-change algorithm.
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
like the media codecs' seams: encrypted PDFs (``/Encrypt``),
DCT-filtered content, LZW with ``EarlyChange 0``, CID/Type0 composite
fonts with multi-byte encodings (a real deployment slots
pdfminer/poppler in per payload — the Spark plumbing is identical).

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
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R\b")
_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_PREV_RE = re.compile(rb"/Prev\s+(\d+)\b")
_SIZE_RE = re.compile(rb"/Size\s+(\d+)\b")
_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_INDEX_RE = re.compile(rb"/Index\s*\[([\d\s]+)\]")
_N_RE = re.compile(rb"/N\s+(\d+)\b")
_FIRST_RE = re.compile(rb"/First\s+(\d+)\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _pdf_objects(payload: bytes) -> list[tuple[int, bytes]]:
    """Every ``(objnum, body)`` from a direct ``obj … endobj`` scan —
    the resilient path real extractors keep for files whose xref is
    damaged (common enough in the wild that scanning is standard)."""
    out = []
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("PDF object unterminated")
        out.append((int(m.group(1)), payload[m.end() : end]))
    return out


def _obj_at(payload: bytes, off: int) -> tuple[int, bytes] | None:
    """The ``(objnum, body)`` whose ``N G obj`` header sits at byte
    ``off`` (leading whitespace tolerated), or None when the offset is
    stale — the caller falls back to scanning."""
    while off < len(payload) and payload[off] in _WS:
        off += 1
    m = _OBJ_RE.match(payload, off)
    if not m:
        return None
    end = payload.find(b"endobj", m.end())
    if end < 0:
        return None
    return int(m.group(1)), payload[m.end() : end]


def _stream_of(body: bytes, resolve=None) -> bytes | None:
    """The decoded stream of one object body (None when it has no
    stream): sliced by a direct /Length integer when present, by the
    resolved referenced integer when /Length is indirect (``N G R``)
    and a resolver is given (r13 — real-world PDFs routinely store
    content-stream lengths as separate objects, often inside an
    object stream), else by the endstream delimiter; /FlateDecode
    inflated, /LZWDecode (r13) decoded with the TIFF-variant LZW the
    repo already owns — ISO 32000 §7.4.4 is the same MSB-first
    early-change algorithm (EarlyChange=1 default; 0 stays a seam)."""
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
    clen = None
    if m:
        clen = int(m.group(1))
    elif resolve is not None:
        mr = _LENGTH_REF_RE.search(dict_part)
        if mr:
            ref_body = resolve(int(mr.group(1)))
            if ref_body is not None:
                mi = re.match(rb"\s*(\d+)\s*$", ref_body)
                if mi:
                    clen = int(mi.group(1))
    if clen is not None:
        data = body[i : i + clen]
    else:  # unresolvable /Length: fall back to the delimiter
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
        elif b"/LZWDecode" in dict_part:
            if re.search(rb"/EarlyChange\s+0\b", dict_part):
                raise ValueError(
                    "PDF LZW EarlyChange=0 outside PDF_CAPABILITIES "
                    "(pdfminer seam)"
                )
            from timeseries_db_spark.operators.multimodal import (
                _tiff_lzw_decode,
            )

            data = bytes(_tiff_lzw_decode(data, None))
        else:
            raise ValueError(
                "PDF filter outside PDF_CAPABILITIES (FlateDecode/"
                "LZWDecode only; DCT/etc = pdfminer seam)"
            )
    return data


def _pdf_xref(payload: bytes) -> dict[int, tuple]:
    """The cross-reference directory (r13, VERDICT item 5): follows
    ``startxref`` to a CLASSIC table (``xref`` keyword, 20-byte
    entries, ``trailer`` dict) or a PDF-1.5 XREF STREAM (``/Type
    /XRef``, ``/W`` field widths, ``/Index`` subsections, binary rows,
    usually Flate), chaining ``/Prev`` sections newest-first (the
    first definition of an object number wins — incremental-update
    semantics). Returns ``{objnum: ('at', offset)}`` for regular
    objects and ``{objnum: ('in', objstm_num, idx)}`` for type-2
    entries living inside an object stream. Raises ``ValueError`` on
    structural damage — callers fall back to the direct scan."""
    m = None
    for m in _STARTXREF_RE.finditer(payload):
        pass
    if m is None:
        raise ValueError("PDF has no startxref")
    off = int(m.group(1))
    entries: dict[int, tuple] = {}
    seen_offsets: set[int] = set()
    while off is not None and off not in seen_offsets:
        seen_offsets.add(off)
        j = off
        while j < len(payload) and payload[j] in _WS:
            j += 1
        if payload[j : j + 4] == b"xref":  # classic table
            j += 4
            while True:
                while j < len(payload) and payload[j] in _WS:
                    j += 1
                ms = re.match(rb"(\d+)\s+(\d+)", payload[j:])
                if not ms:
                    break
                start, count = int(ms.group(1)), int(ms.group(2))
                j += ms.end()
                while j < len(payload) and payload[j] in b"\r\n ":
                    j += 1
                for k in range(count):
                    row = payload[j : j + 20]
                    if len(row) < 18:
                        raise ValueError("PDF xref table truncated")
                    kind = row[17:18]
                    if kind == b"n":
                        entries.setdefault(
                            start + k, ("at", int(row[0:10]))
                        )
                    elif kind != b"f":
                        raise ValueError("PDF xref entry type unknown")
                    j += 20
            at_trailer = payload.find(b"trailer", j)
            if at_trailer < 0:
                raise ValueError("PDF xref table has no trailer")
            tail = payload[at_trailer : at_trailer + 512]
            mp = _PREV_RE.search(tail)
            off = int(mp.group(1)) if mp else None
        else:  # xref STREAM object
            got = _obj_at(payload, off)
            if got is None:
                raise ValueError("PDF startxref points at no object")
            _num, body = got
            at = body.find(b"stream")
            dict_part = body[: at if at >= 0 else len(body)]
            if b"/XRef" not in dict_part:
                raise ValueError("PDF startxref object is not /Type /XRef")
            mw = _W_RE.search(dict_part)
            msz = _SIZE_RE.search(dict_part)
            if not mw or not msz:
                raise ValueError("PDF xref stream missing /W or /Size")
            w = tuple(int(mw.group(g)) for g in (1, 2, 3))
            mi = _INDEX_RE.search(dict_part)
            if mi:
                nums = [int(x) for x in mi.group(1).split()]
                index = list(zip(nums[0::2], nums[1::2]))
            else:
                index = [(0, int(msz.group(1)))]
            data = _stream_of(body)
            if data is None:
                raise ValueError("PDF xref stream has no stream data")
            rw = sum(w)
            pos = 0
            for start, count in index:
                for k in range(count):
                    row = data[pos : pos + rw]
                    if len(row) < rw:
                        raise ValueError("PDF xref stream rows truncated")
                    pos += rw
                    fields = []
                    p2 = 0
                    for width in w:
                        fields.append(
                            int.from_bytes(row[p2 : p2 + width], "big")
                            if width
                            else None
                        )
                        p2 += width
                    typ = fields[0] if w[0] else 1
                    if typ == 1:
                        entries.setdefault(start + k, ("at", fields[1]))
                    elif typ == 2:
                        entries.setdefault(
                            start + k, ("in", fields[1], fields[2])
                        )
                    # type 0 = free list: skipped
            mp = _PREV_RE.search(dict_part)
            off = int(mp.group(1)) if mp else None
    return entries


def _objstm_members(
    body: bytes, resolve=None
) -> list[tuple[int, bytes]]:
    """The ``(objnum, body)`` members of one ``/Type /ObjStm`` object
    stream (r13): the decoded stream opens with N (objnum, offset)
    integer pairs, member bodies start at ``/First + offset``. Members
    are dict/number/array objects by spec (streams cannot nest), so
    they feed reference resolution and the text scan's object
    directory, never the stream decoder."""
    at = body.find(b"stream")
    dict_part = body[: at if at >= 0 else len(body)]
    mn, mf = _N_RE.search(dict_part), _FIRST_RE.search(dict_part)
    if not mn or not mf:
        raise ValueError("PDF ObjStm missing /N or /First")
    n, first = int(mn.group(1)), int(mf.group(1))
    data = _stream_of(body, resolve)
    if data is None:
        raise ValueError("PDF ObjStm has no stream")
    nums = data[:first].split()
    if len(nums) < 2 * n:
        raise ValueError("PDF ObjStm header pairs truncated")
    pairs = [
        (int(nums[2 * i]), int(nums[2 * i + 1])) for i in range(n)
    ]
    out = []
    for i, (objnum, o) in enumerate(pairs):
        end = first + pairs[i + 1][1] if i + 1 < n else len(data)
        out.append((objnum, data[first + o : end]))
    return out


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
    for encrypted files and unsupported filters.

    r13 (VERDICT item 5): the object directory comes from the XREF
    WALK when it parses — classic tables, PDF-1.5 xref streams, /Prev
    chains — with ``/Type /ObjStm`` object streams expanded so their
    members (the usual home of page dicts and length integers in
    real-world files) resolve indirect references; a damaged xref
    falls back to the direct scan, like real extractors. Indirect
    ``/Length N G R`` content-stream lengths resolve through the
    directory. ``/Type /ObjStm`` and ``/Type /XRef`` streams are
    infrastructure, not page content — they are excluded from the
    text scan (an xref stream's binary rows could contain ``BT`` by
    chance) but counted in ``n_streams`` like any other stream."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in payload:
        raise ValueError(
            "encrypted PDF outside PDF_CAPABILITIES (pdfminer seam)"
        )
    objs: list[tuple[int, bytes]] = []
    try:
        xref = _pdf_xref(payload)
        for num in sorted(xref):
            ent = xref[num]
            if ent[0] == "at":
                got = _obj_at(payload, ent[1])
                if got is None:  # stale offset: the xref lied
                    raise ValueError("PDF xref offset stale")
                objs.append((num, got[1]))
    except ValueError:
        xref = None
        objs = _pdf_objects(payload)
    directory = dict(objs)

    def resolve(num: int) -> bytes | None:
        return directory.get(num)

    # expand object streams: members join the directory (reference
    # resolution) and the object list (no streams inside, by spec)
    for num, body in list(objs):
        at = body.find(b"stream")
        if at >= 0 and b"/ObjStm" in body[:at]:
            for mnum, mbody in _objstm_members(body, resolve):
                directory.setdefault(mnum, mbody)
                objs.append((mnum, mbody))
    texts: list[str] = []
    n_shows = 0
    n_streams = 0
    for _num, body in objs:
        at = body.find(b"stream")
        if at < 0:
            continue
        dict_part = body[:at]
        if b"/ObjStm" in dict_part or b"/XRef" in dict_part:
            n_streams += 1  # infrastructure stream, never page text
            continue
        data = _stream_of(body, resolve)
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


def _pdf_shows(
    lines: list[str], use_tj_array: bool
) -> bytes:
    """One page's content-stream bytes (shared by both writer
    layouts)."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ).encode("latin-1")

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
    return b"BT /F1 12 Tf 72 720 Td 14 TL\n" + b"\n".join(shows) + b"\nET"


def pdf_build(
    pages: list[list[str]], *, flate: bool = True,
    use_tj_array: bool = False, lzw: bool = False,
    xref_stream: bool = False,
) -> bytes:
    """Minimal valid PDF writer (tests + fixtures): one content stream
    per page, each inner list one text line (``Td``-positioned ``Tj``
    shows — or a kerned ``TJ`` array per line with ``use_tj_array``),
    a Type1 /Helvetica font, FlateDecode (default), raw, or
    ``lzw=True`` LZWDecode content. The extractor's roundtrip pin.

    ``xref_stream=True`` (r13) emits the PDF-1.5 layout real-world
    files use: the document dicts (catalog/pages/font/page) AND the
    content-stream length integers live in a Flate-compressed ``/Type
    /ObjStm`` object stream, content streams carry INDIRECT ``/Length
    N 0 R`` references into it, and the cross-reference is a binary
    ``/Type /XRef`` stream (``/W [1 2 1]``, type-1 and type-2 rows) —
    so the reader's xref walk, ObjStm expansion, and indirect-length
    resolution are all on the extraction path."""

    def enc(content: bytes) -> tuple[bytes, str]:
        if lzw:
            from timeseries_db_spark.operators.multimodal import (
                _tiff_lzw_encode,
            )

            return _tiff_lzw_encode(content), " /Filter /LZWDecode"
        if flate:
            return zlib.compress(content), " /Filter /FlateDecode"
        return content, ""

    n_p = len(pages)
    if not xref_stream:
        objs: list[bytes] = []
        page_ids = [4 + 2 * i for i in range(n_p)]
        kids = " ".join(f"{p} 0 R" for p in page_ids)
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            f"<< /Type /Pages /Kids [{kids}] /Count {n_p} >>".encode()
        )
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        for i, lines in enumerate(pages):
            content, filt = enc(_pdf_shows(lines, use_tj_array))
            objs.append(
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {page_ids[i] + 1} 0 R >>".encode()
            )
            objs.append(
                f"<< /Length {len(content)}{filt} >>\nstream\n".encode()
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

    # --- PDF-1.5 layout: ObjStm + xref stream ---
    # numbering: 1 catalog, 2 pages, 3 font (ObjStm members);
    # page i: 4+3i page dict (member), 5+3i content stream (regular),
    # 6+3i length integer (member); then ObjStm, then XRef stream.
    objstm_num = 4 + 3 * n_p
    xref_num = objstm_num + 1
    contents: list[bytes] = []
    members: list[tuple[int, bytes]] = [
        (1, f"<< /Type /Catalog /Pages 2 0 R >>".encode()),
        (
            2,
            (
                "<< /Type /Pages /Kids ["
                + " ".join(f"{4 + 3 * i} 0 R" for i in range(n_p))
                + f"] /Count {n_p} >>"
            ).encode(),
        ),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    for i, lines in enumerate(pages):
        content, filt = enc(_pdf_shows(lines, use_tj_array))
        contents.append(
            f"<< /Length {6 + 3 * i} 0 R{filt} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )
        members.append(
            (
                4 + 3 * i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox "
                    f"[0 0 612 792] /Resources << /Font << /F1 3 0 R >> "
                    f">> /Contents {5 + 3 * i} 0 R >>"
                ).encode(),
            )
        )
        members.append((6 + 3 * i, str(len(content)).encode()))
    bodies = bytearray()
    pairs = []
    for mnum, mbody in members:
        pairs.append(f"{mnum} {len(bodies)}")
        bodies += mbody + b" "
    header = (" ".join(pairs) + " ").encode()
    stm_data = zlib.compress(header + bytes(bodies))
    objstm_body = (
        f"<< /Type /ObjStm /N {len(members)} /First {len(header)} "
        f"/Length {len(stm_data)} /Filter /FlateDecode >>\nstream\n".encode()
        + stm_data
        + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.5\n")
    at_of: dict[int, int] = {}
    for i, cbody in enumerate(contents):
        num = 5 + 3 * i
        at_of[num] = len(out)
        out += f"{num} 0 obj\n".encode() + cbody + b"\nendobj\n"
    at_of[objstm_num] = len(out)
    out += f"{objstm_num} 0 obj\n".encode() + objstm_body + b"\nendobj\n"
    # xref stream rows, /W [1 4 1]: object 0 free, members type 2,
    # regular objects type 1
    size = xref_num + 1
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + bytes([255])  # obj 0
    for num in range(1, size):
        if num in at_of:
            rows += bytes([1]) + at_of[num].to_bytes(4, "big")
            rows += bytes([0])
        elif num == xref_num:
            pass  # appended below once its offset is known
        else:
            idx = next(
                i for i, (mnum, _) in enumerate(members) if mnum == num
            )
            rows += bytes([2]) + objstm_num.to_bytes(4, "big")
            rows += bytes([idx])
    xref_at = len(out)
    rows += bytes([1]) + xref_at.to_bytes(4, "big") + bytes([0])
    xrow = zlib.compress(bytes(rows))
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /Root 1 0 R "
        f"/W [1 4 1] /Length {len(xrow)} /Filter /FlateDecode >>"
        f"\nstream\n".encode()
        + xrow
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
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
