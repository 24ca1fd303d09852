"""Error-message wire parity with the reference.

Default messages are modernized (clearer wording, no Haskell ``show``
quoting). A wire-parity user — one whose client string-matches the
reference's HTTP 400 bodies — can flip :func:`set_reference_wire` and
every data-dependent / validation error emits the BYTE-EXACT reference
string instead, including the ``"You must provie …"`` typo:

* ``illegalQM`` — ``Model.hs:126-134``;
* ``noDataErr`` — ``Queries/Utils.hs:47-49`` (Haskell ``show`` on a
  ``Text`` tag double-quotes and backslash-escapes it);
* ``handleAvg`` — ``Queries.hs:149,165`` (identical in both modes);
* ``errMsgInsert`` / ``errMsgModify`` — ``Queries.hs:60-65``.

Engine-specific errors with no reference equivalent (NULL-field
rejection, intra-batch duplicate keys — the documented reference-anomaly
fixes) keep their modern strings in both modes.
"""

from __future__ import annotations

_REFERENCE_WIRE = False


def set_reference_wire(enabled: bool = True) -> None:
    """Globally switch error texts to the reference's exact strings."""
    global _REFERENCE_WIRE
    _REFERENCE_WIRE = bool(enabled)


def is_reference_wire() -> bool:
    return _REFERENCE_WIRE


def _show_tag(tag: str) -> str:
    """Haskell ``show`` for Text: double-quoted, backslash escapes."""
    return '"' + tag.replace("\\", "\\\\").replace('"', '\\"') + '"'


# ---- illegalQM (Model.hs:126-134) ----

def illegal_group_by() -> str:
    if _REFERENCE_WIRE:
        return "You must provie 'aggFunc' with 'groupBy'."  # typo is the reference's
    return "Illegal query: 'groupBy' requires 'aggFunc'."


def illegal_gt_ge() -> str:
    if _REFERENCE_WIRE:
        return "Can't query 'gt' and 'ge' at the same time."
    return "Illegal query: 'gt' and 'ge' are mutually exclusive."


def illegal_lt_le() -> str:
    if _REFERENCE_WIRE:
        return "Can't query 'lt' and 'le' at the same time."
    return "Illegal query: 'lt' and 'le' are mutually exclusive."


def illegal_ts_eq() -> str:
    if _REFERENCE_WIRE:
        return "Can't query 'tsEq' with any other timestamp condition."
    return "Illegal query: 'tsEq' excludes other timestamp bounds."


# ---- noDataErr (Queries/Utils.hs:47-49) ----

def no_data_tag(tag: str) -> str:
    if _REFERENCE_WIRE:
        return f"No data for tag {_show_tag(tag)}."
    return f"No data for tag {tag}."


def no_data_ts(ts: int) -> str:
    return f"No data for timestamp {ts}."  # identical in both modes


# ---- handleAvg (Queries.hs:149,165) ----

def avg_failed() -> str:
    return "Average failed."  # identical in both modes


# ---- errMsgInsert / errMsgModify (Queries.hs:60-65) ----

def key_exists(ts: int, tag: str) -> str:
    if _REFERENCE_WIRE:
        return f"Timestamp = {ts} and tag = {_show_tag(tag)} already exists."
    return f"Key already exists: timestamp={ts}, tag={tag}."


def key_not_found(ts: int, tag: str, op: str) -> str:
    if _REFERENCE_WIRE:
        return f"Timestamp = {ts} and tag = {_show_tag(tag)} not found."
    return f"Cannot {op}: no entry for timestamp={ts}, tag={tag}."
