"""Sidecar shard manifests for TRAILER-LESS formats (r17 — VERDICT
item 4).

The r16 Hypothesis properties proved that ``.sz`` (snappy framing) and
``.sobj`` / ``.cwire`` (Avro single-object / Confluent wire) shards
truncated EXACTLY at a chunk/message boundary are silent BY FORMAT —
the stream carries no trailer, no length, no message count, so a
clean-looking prefix is indistinguishable from the whole file. A
sidecar manifest converts that one silent loss mode into a detected
one: first-party writers emit ``<shard>.manifest.json`` holding the
shard's row count and byte length; readers verify BOTH before
trusting a clean decode, pricing a mismatch as one quarantine row.
Foreign shards without a manifest keep the documented format-inherent
caveat (narrowed in SCALE.md, "Truncation blind spots").

Scale posture: the manifest is opened executor-side next to the shard
it describes (same directory, same filesystem) — one tiny read per
shard inside the existing Arrow kernel, no extra Spark job, no driver
round-trip. Paths arrive as Spark ``binaryFile`` URIs; POSIX-reachable
filesystems (local, NFS, fuse-mounted object stores) are supported —
on a raw object store, route the sidecar read through the store's
client in the same kernel (documented seam, not implemented here).
"""

from __future__ import annotations

import json
import os


def manifest_path(shard_path: str) -> str:
    """``<shard>.manifest.json`` — the sidecar's canonical name."""
    return shard_path + ".manifest.json"


def write_manifest(shard_path: str, rows: int) -> None:
    """Emit the sidecar for an already-written shard (byte length is
    taken from the file itself)."""
    with open(manifest_path(shard_path), "w") as f:
        json.dump(
            {"rows": int(rows), "bytes": os.path.getsize(shard_path)}, f
        )


def write_shard_with_manifest(
    shard_path: str, data: bytes, rows: int
) -> None:
    """Write a shard and its sidecar together — the first-party
    writer's one-call shape."""
    with open(shard_path, "wb") as f:
        f.write(data)
    with open(manifest_path(shard_path), "w") as f:
        json.dump({"rows": int(rows), "bytes": len(data)}, f)


def _local_path(shard_uri: str) -> str:
    """POSIX path of a Spark binaryFile URI (``file:/x``,
    ``file:///x``, ``file://host/x`` or already-plain)."""
    p = shard_uri
    if p.startswith("file:"):
        p = p[len("file:"):]
        if p.startswith("//"):
            nxt = p.find("/", 2)
            p = p[nxt:] if nxt != -1 else p
    return p


def load_manifest(shard_uri: str) -> tuple[int, int] | None:
    """(rows, bytes) of a shard's sidecar, or None when no readable
    well-formed sidecar exists (foreign shard — no check applies)."""
    try:
        with open(manifest_path(_local_path(shard_uri))) as f:
            m = json.load(f)
        return int(m["rows"]), int(m["bytes"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def manifest_error(
    shard_uri: str, nbytes: int, rows: int
) -> str | None:
    """The quarantine message for a shard whose decode LOOKED clean
    but disagrees with its sidecar — or None when the sidecar is
    absent (foreign shard) or agrees. Byte length is checked first:
    it catches boundary truncation even before row counting, and a
    byte-exact file with a row mismatch indicates decoder drift
    rather than transport loss (the message says which)."""
    m = load_manifest(shard_uri)
    if m is None:
        return None
    erows, ebytes = m
    if nbytes != ebytes:
        return (
            f"shard manifest mismatch: {nbytes} bytes on disk,"
            f" {ebytes} expected (truncated or padded shard)"
        )
    if rows != erows:
        return (
            f"shard manifest mismatch: {rows} rows decoded,"
            f" {erows} expected (byte length matches — decoder or"
            " manifest drift)"
        )
    return None
