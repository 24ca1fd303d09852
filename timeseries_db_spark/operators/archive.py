"""Archive ingestion (r13): TAR and ZIP containers parsed from spec —
the packaging real datasets actually arrive in (a Common Crawl dump, a
LAION shard, a code corpus: tarballs and zips of mixed-modality files).
Members are enumerated, decompressed (ZIP deflate via stdlib ``zlib``
raw-inflate, CRC-verified) and routed by MAGIC to the repo's existing
decode surfaces (image/audio/video/PDF/WARC/text), so one ingest
operator turns an archive column into the same asset rows every other
kernel consumes.

* **TAR** (POSIX ustar): 512-byte headers — name(100), size as octal
  at offset 124, typeflag at 156 (regular files only; directories and
  link entries are enumerated but carry no payload), data padded to
  512, two zero blocks end the stream. Header checksum verified
  (unsigned sum with the checksum field blanked). GNU long-name 'L'
  entries apply their payload as the next member's name (r13 late).
* **ZIP** (APPNOTE): EOCD scan from the tail (comment-tolerant),
  central-directory walk (the AUTHORITATIVE member list — local
  headers are only trusted for their variable-length field sizes),
  stored (0) and deflate (8) methods, CRC-32 verified per member;
  ZIP64 via the EOCD64 locator/record chain + 0x0001 extra fields
  (r13 late). Encryption stays the documented seam.

Scale posture: the standard Arrow-batched ``mapInPandas`` payload
kernel — archives expand executor-side, one row per member, and the
member payloads feed the downstream decode stages without touching the
driver. At 100 TB the archive files are the arrival unit exactly like
WARC segments.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tar_members(payload: bytes) -> list[tuple[str, bytes]]:
    """(name, data) for every REGULAR file of a ustar/tar stream —
    GNU long-name (``L``) entries apply their payload as the NEXT
    member's name (r13 late; names >100 bytes are how deep dataset
    trees actually tar up). Raises ``ValueError`` on a bad header
    checksum or truncation."""
    b = payload
    out: list[tuple[str, bytes]] = []
    at = 0
    pending_name: str | None = None
    while at + 512 <= len(b):
        hdr = b[at : at + 512]
        if hdr == b"\x00" * 512:
            break  # end-of-archive marker
        stored = hdr[148:156]
        try:
            chk = int(stored.split(b"\x00")[0].strip() or b"0", 8)
        except ValueError as e:
            raise ValueError("tar header checksum unparseable") from e
        calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
        if chk != calc:
            raise ValueError(
                f"tar header checksum mismatch at offset {at}"
            )
        name = hdr[:100].split(b"\x00")[0].decode("utf-8", "replace")
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        typeflag = hdr[156:157]
        data_at = at + 512
        if data_at + size > len(b):
            raise ValueError("tar member data truncated")
        data = b[data_at : data_at + size]
        if typeflag == b"L":
            pending_name = (
                data.split(b"\x00")[0].decode("utf-8", "replace")
            )
        elif typeflag in (b"0", b"\x00"):
            out.append((pending_name or name, data))
            pending_name = None
        else:
            pending_name = None
        at = data_at + ((size + 511) // 512) * 512
    return out


def zip_members(payload: bytes) -> list[tuple[str, bytes]]:
    """(name, data) for every file of a ZIP archive, via the central
    directory; stored + deflate methods, member CRC-32 verified.
    ZIP64 (r13 late): the EOCD64 locator/record chain and the 0x0001
    extra field resolve the 0xFFFF/0xFFFFFFFF markers — the layout
    large dataset zips actually use. Raises ``ValueError`` for other
    methods/encryption/corruption."""
    b = payload
    eocd = b.rfind(b"PK\x05\x06", max(0, len(b) - 65_557))
    if eocd < 0:
        raise ValueError("ZIP end-of-central-directory not found")
    n = int.from_bytes(b[eocd + 10 : eocd + 12], "little")
    cd_at = int.from_bytes(b[eocd + 16 : eocd + 20], "little")
    if n == 0xFFFF or cd_at == 0xFFFFFFFF:
        loc = b.rfind(b"PK\x06\x07", max(0, eocd - 20), eocd)
        if loc < 0:
            raise ValueError("ZIP64 EOCD locator missing")
        r64 = int.from_bytes(b[loc + 8 : loc + 16], "little")
        if b[r64 : r64 + 4] != b"PK\x06\x06":
            raise ValueError("ZIP64 EOCD record missing")
        n = int.from_bytes(b[r64 + 32 : r64 + 40], "little")
        cd_at = int.from_bytes(b[r64 + 48 : r64 + 56], "little")
    out: list[tuple[str, bytes]] = []
    at = cd_at
    for _ in range(n):
        if b[at : at + 4] != b"PK\x01\x02":
            raise ValueError("ZIP central-directory entry desynced")
        flags = int.from_bytes(b[at + 8 : at + 10], "little")
        if flags & 0x01:
            raise ValueError("ZIP encryption unsupported (seam)")
        method = int.from_bytes(b[at + 10 : at + 12], "little")
        crc = int.from_bytes(b[at + 16 : at + 20], "little")
        csize = int.from_bytes(b[at + 20 : at + 24], "little")
        usize = int.from_bytes(b[at + 24 : at + 28], "little")
        nlen = int.from_bytes(b[at + 28 : at + 30], "little")
        elen = int.from_bytes(b[at + 30 : at + 32], "little")
        clen = int.from_bytes(b[at + 32 : at + 34], "little")
        lho = int.from_bytes(b[at + 42 : at + 46], "little")
        name = b[at + 46 : at + 46 + nlen].decode("utf-8", "replace")
        extra = b[at + 46 + nlen : at + 46 + nlen + elen]
        # ZIP64 extra field 0x0001: 8-byte values, present ONLY for
        # the fields the fixed entry marked 0xFFFFFFFF, in spec order
        # usize, csize, lho
        j = 0
        while j + 4 <= len(extra):
            fid = int.from_bytes(extra[j : j + 2], "little")
            flen = int.from_bytes(extra[j + 2 : j + 4], "little")
            if fid == 0x0001:
                p = j + 4
                if usize == 0xFFFFFFFF:
                    usize = int.from_bytes(extra[p : p + 8], "little")
                    p += 8
                if csize == 0xFFFFFFFF:
                    csize = int.from_bytes(extra[p : p + 8], "little")
                    p += 8
                if lho == 0xFFFFFFFF:
                    lho = int.from_bytes(extra[p : p + 8], "little")
                    p += 8
            j += 4 + flen
        at += 46 + nlen + elen + clen
        if b[lho : lho + 4] != b"PK\x03\x04":
            raise ValueError("ZIP local header desynced")
        lnlen = int.from_bytes(b[lho + 26 : lho + 28], "little")
        lelen = int.from_bytes(b[lho + 28 : lho + 30], "little")
        data_at = lho + 30 + lnlen + lelen
        raw = b[data_at : data_at + csize]
        if len(raw) != csize:
            raise ValueError("ZIP member data truncated")
        if method == 0:
            data = raw
        elif method == 8:
            data = zlib.decompressobj(-15).decompress(raw)
        else:
            raise ValueError(
                f"ZIP compression method {method} unsupported "
                "(stored/deflate only; seam)"
            )
        if len(data) != usize or zlib.crc32(data) != crc:
            raise ValueError(f"ZIP member {name!r} CRC/size mismatch")
        if not name.endswith("/"):
            out.append((name, data))
    return out


def archive_members(payload: bytes) -> list[tuple[str, bytes]]:
    """Magic-dispatching member enumeration: ZIP (``PK``), tar (ustar
    magic at 257, or a checksum-valid first header), or either inside
    a gzip / xz / bzip2 wrapper (``.tar.{gz,xz,bz2}`` — the shapes
    tarballs actually ship in; zstd stays the documented seam — no
    stdlib decoder on this interpreter)."""
    b = payload
    if b[:2] == b"\x1f\x8b":
        b = zlib.decompress(b, wbits=31)
    elif b[:6] == b"\xfd7zXZ\x00":
        import lzma

        b = lzma.decompress(b)
    elif b[:3] == b"BZh":
        import bz2

        b = bz2.decompress(b)
    if b[:2] == b"PK":
        return zip_members(b)
    if len(b) >= 512 and (
        b[257:262] == b"ustar" or b[148:156].strip(b"\x00 ")
    ):
        return tar_members(b)
    raise ValueError("unrecognized archive container")


def tar_build(members: list[tuple[str, bytes]]) -> bytes:
    """Minimal ustar writer (the reader's roundtrip pin) — names over
    100 bytes emit a GNU ``L`` long-name entry first (r13 late)."""

    def one(name_b: bytes, data: bytes, typeflag: bytes) -> bytes:
        hdr = bytearray(512)
        hdr[: len(name_b)] = name_b
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(data):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[156:157] = typeflag
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[148:156] = b" " * 8
        hdr[148:156] = f"{sum(hdr):06o}\x00 ".encode()
        return bytes(hdr) + data + bytes((-len(data)) % 512)

    out = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            out += one(b"././@LongLink", nb + b"\x00", b"L")
            nb = nb[:100]
        out += one(nb, data, b"0")
    out += bytes(1024)
    return bytes(out)


def zip_build(
    members: list[tuple[str, bytes]], deflate: bool = True,
    zip64: bool = False,
) -> bytes:
    """Minimal ZIP writer (stored or deflate; the reader's pin).
    ``zip64=True`` (r13 late) forces the ZIP64 layout — 0xFFFFFFFF
    markers resolved through 0x0001 extra fields, EOCD64 record +
    locator — so the reader's large-archive path is pinned without a
    4 GB fixture."""
    out = bytearray()
    cd = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data)
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(data) + co.flush()
            method = 8
        else:
            raw = data
            method = 0
        lho = len(out)
        common = (
            (45 if zip64 else 20).to_bytes(2, "little")  # version needed
            + b"\x00\x00"  # flags
            + method.to_bytes(2, "little")
            + b"\x00\x00\x00\x00"  # dos time/date
            + crc.to_bytes(4, "little")
            + len(raw).to_bytes(4, "little")
            + len(data).to_bytes(4, "little")
            + len(nb).to_bytes(2, "little")
            + b"\x00\x00"  # extra len (local)
        )
        out += b"PK\x03\x04" + common + nb + raw
        if zip64:
            extra = (
                (0x0001).to_bytes(2, "little")
                + (24).to_bytes(2, "little")
                + len(data).to_bytes(8, "little")
                + len(raw).to_bytes(8, "little")
                + lho.to_bytes(8, "little")
            )
            cd_common = (
                (45).to_bytes(2, "little")
                + b"\x00\x00"
                + method.to_bytes(2, "little")
                + b"\x00\x00\x00\x00"
                + crc.to_bytes(4, "little")
                + b"\xff\xff\xff\xff" * 2  # csize/usize deferred
                + len(nb).to_bytes(2, "little")
                + len(extra).to_bytes(2, "little")
            )
            cd += (
                b"PK\x01\x02" + (45).to_bytes(2, "little") + cd_common
                + b"\x00\x00" + b"\x00\x00"
                + b"\x00\x00" + b"\x00\x00\x00\x00"
                + b"\xff\xff\xff\xff"  # lho deferred
                + nb + extra
            )
        else:
            cd += (
                b"PK\x01\x02" + (20).to_bytes(2, "little") + common
                + b"\x00\x00"  # comment len
                + b"\x00\x00"  # disk start
                + b"\x00\x00" + b"\x00\x00\x00\x00"  # int/ext attrs
                + lho.to_bytes(4, "little")
                + nb
            )
    cd_at = len(out)
    out += cd
    if zip64:
        r64_at = len(out)
        out += (
            b"PK\x06\x06" + (44).to_bytes(8, "little")
            + (45).to_bytes(2, "little") + (45).to_bytes(2, "little")
            + b"\x00\x00\x00\x00" * 2  # disk numbers
            + len(members).to_bytes(8, "little") * 2
            + len(cd).to_bytes(8, "little")
            + cd_at.to_bytes(8, "little")
        )
        out += (
            b"PK\x06\x07" + b"\x00\x00\x00\x00"
            + r64_at.to_bytes(8, "little")
            + (1).to_bytes(4, "little")
        )
        out += (
            b"PK\x05\x06" + b"\x00\x00" * 2
            + b"\xff\xff" * 2
            + b"\xff\xff\xff\xff" * 2
            + b"\x00\x00"
        )
    else:
        out += (
            b"PK\x05\x06" + b"\x00\x00" * 2
            + len(members).to_bytes(2, "little") * 2
            + len(cd).to_bytes(4, "little")
            + cd_at.to_bytes(4, "little")
            + b"\x00\x00"
        )
    return bytes(out)


#: magic → asset kind for member routing (the repo's decode surfaces)
_MAGIC_KINDS: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image"),
    (b"\xff\xd8", "image"),
    (b"BM", "image"),
    (b"GIF8", "image"),
    (b"II*\x00", "image"),
    (b"MM\x00*", "image"),
    (b"\x00\x00\x01\x00", "image"),
    (b"RIFF", "audio"),  # refined below (AVI → video)
    (b"FORM", "audio"),
    (b"fLaC", "audio"),
    (b"OggS", "audio"),
    (b"ID3", "audio"),
    (b"\x1aE\xdf\xa3", "video"),
    (b"%PDF-", "pdf"),
    (b"WARC/", "warc"),
]


def sniff_kind(data: bytes) -> str:
    """The asset kind a member's MAGIC routes it to — image / audio /
    video / pdf / warc / text (valid UTF-8) / other."""
    for magic, kind in _MAGIC_KINDS:
        if data[: len(magic)] == magic:
            if magic == b"RIFF" and data[8:12] == b"AVI ":
                return "video"
            if magic[:2] == b"PK":
                return "archive"
            return kind
    if data[4:8] == b"ftyp":
        return "video"
    if data[:2] == b"PK":
        return "archive"
    head = data[:4096]
    if len(data) > 4096:
        # r14 (ADVICE): the 4096-byte window may split a multibyte
        # sequence — trim up to 3 trailing continuation bytes (plus the
        # lead byte they belong to) so a valid UTF-8 member isn't
        # misclassified as 'other' on a window artifact
        cut = len(head)
        while cut > 0 and cut > len(head) - 4 and head[cut - 1] & 0xC0 == 0x80:
            cut -= 1
        if cut > 0 and head[cut - 1] & 0xC0 == 0xC0:
            cut -= 1
        head = head[:cut]
    try:
        head.decode("utf-8")
        return "text"
    except UnicodeDecodeError:
        return "other"


def expand_archive_assets(
    assets: DataFrame, id_stride: int = 1000
) -> DataFrame:
    """(asset_id, member_idx, name, kind, payload) — one row per
    archive member, ``kind`` sniffed by magic so the rows feed the
    existing decode operators directly (``member asset_id =
    archive_id * id_stride + member_idx`` when a consumer needs a
    flat id space). Arrow-batched, map-only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                for k, (name, data) in enumerate(
                    archive_members(bytes(payload))
                ):
                    rows.append(
                        (int(asset_id), k, name, sniff_kind(data), data)
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "member_idx", "name", "kind", "payload"],
            )

    return (
        assets.filter(F.col("kind") == "archive")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, member_idx long, name string, "
            "kind string, payload binary",
        )
    )


def synth_archive(doc_id: int) -> bytes:
    """Deterministic archive for the gate fixture (r13): the container
    cycles tar / zip-deflate / zip-stored by ``(doc_id // 3) % 3``;
    members are one 4×4 PNG of constant ``(3·id + 11) % 256`` (a
    second of ``(5·id + 7) % 256`` on odd ids) plus a text member
    ``Doc {id} text`` — member count, image count, decoded pixel sums
    and text length are all closed forms."""
    from timeseries_db_spark.operators.multimodal import png_encode

    members = [
        (
            "img/a.png",
            png_encode(bytes([(3 * doc_id + 11) % 256]) * 16, 4, 4, 1),
        ),
        ("doc.txt", f"Doc {doc_id} text".encode()),
    ]
    if doc_id % 2:
        members.append(
            (
                "img/b.png",
                png_encode(bytes([(5 * doc_id + 7) % 256]) * 16, 4, 4, 1),
            )
        )
    sel = (doc_id // 3) % 3
    if sel == 0:
        return tar_build(members)
    return zip_build(members, deflate=(sel == 1))


def documents_as_archive_assets(docs: DataFrame) -> DataFrame:
    """Archive-asset fixture (the ``doc_id % 3 == 0`` image subset —
    archives here carry images)."""
    schema = "asset_id long, kind string, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "kind": "archive",
                    "payload": [
                        synth_archive(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .mapInPandas(gen, schema=schema)
    )


def decode_archive_features(assets: DataFrame) -> DataFrame:
    """(asset_id, n_members, n_images, img_px, text_len) — the
    per-archive summary a gate oracle can restate: member count, image
    count, summed decoded pixel values of the image members (through
    :func:`multimodal.image_decode` — the composition point), and the
    summed byte length of text members."""
    import numpy as np

    from timeseries_db_spark.operators.multimodal import image_decode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                members = archive_members(bytes(payload))
                n_img = 0
                img_px = 0
                text_len = 0
                for _name, data in members:
                    kind = sniff_kind(data)
                    if kind == "image":
                        n_img += 1
                        _w, _h, _c, px = image_decode(data)
                        img_px += int(
                            np.frombuffer(px, np.uint8).sum(dtype=np.int64)
                        )
                    elif kind == "text":
                        text_len += len(data)
                rows.append(
                    (int(asset_id), len(members), n_img, img_px, text_len)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_members", "n_images", "img_px",
                    "text_len",
                ],
            )

    return (
        assets.filter(F.col("kind") == "archive")
        .select("asset_id", "payload")
        .mapInPandas(
            gen,
            schema="asset_id long, n_members long, n_images long, "
            "img_px long, text_len long",
        )
    )
