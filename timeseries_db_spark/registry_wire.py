"""Gate entry for SURVEY.md §2.5 (error contract) + O5 (QueryR wire union).

The reference treats error texts as part of the query contract — its
HTTP 400 bodies are exact strings (``Model.hs:126-134`` illegalQM,
``Queries/Utils.hs:47-49`` noDataErr, ``Queries/Utils.hs:66-69``
``"Average failed."``, ``Queries.hs:60-65`` + ``Handlers.hs:55`` DML
errors with the ≤10 cap) and its query responses are the untagged
``QueryR`` union (``Model.hs:150-152``). Until round 7 these were
pytest-only: no driver CORRECTNESS row could fail if they regressed.

``wire_error_contract`` closes that: it drives every §2.5 condition
through the REAL code paths — ``QueryModel.__post_init__`` validation,
``TsdbEngine.query`` strict presence probes / avg check, ``TsTable``
DML validation, and ``TsdbEngine.query_json`` wire shaping — catches
the raised texts (in BOTH wire modes: modern defaults and byte-exact
reference strings under ``wire.set_reference_wire(True)``), serializes
the three ``QueryR`` shapes to canonical JSON, and returns one
``(kind, got)`` row per case. The DuckDB oracle is a closed-form
``VALUES`` literal of the expected strings written out verbatim below —
NOT produced by calling :mod:`timeseries_db_spark.wire` — so a drifted
message or wire shape hash-fails the gate.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

#: Six-row engine fixture: values chosen exactly representable in
#: binary FP so the grouped sums (10.0 / 13.0) are order-independent
#: and the canonical JSON below is byte-stable.
_ROWS = [
    (1000, "a", 1.5),
    (1000, "b", 2.5),
    (2000, "a", 3.5),
    (2000, "b", 4.5),
    (3000, "a", 5.0),
    (3000, "b", 6.0),
]

#: (kind, expected) — the oracle side, spelled out literally.
#: ``m/`` = modern wire texts, ``r/`` = reference byte-exact texts
#: (typo included — ``Model.hs:128``), ``w/`` = QueryR union shapes.
EXPECTED: list[tuple[str, str]] = [
    ("m/illegal_group_by", "Illegal query: 'groupBy' requires 'aggFunc'."),
    ("m/illegal_gt_ge", "Illegal query: 'gt' and 'ge' are mutually exclusive."),
    ("m/illegal_lt_le", "Illegal query: 'lt' and 'le' are mutually exclusive."),
    ("m/illegal_ts_eq", "Illegal query: 'tsEq' excludes other timestamp bounds."),
    ("m/no_data_tag", "No data for tag zz."),
    ("m/no_data_ts", "No data for timestamp 12345."),
    ("m/no_data_tag_ts", "No data for timestamp 12345."),
    ("m/avg_failed", "Average failed."),
    ("m/key_exists", "Key already exists: timestamp=1000, tag=a."),
    ("m/key_missing_update", "Cannot update: no entry for timestamp=9999, tag=zz."),
    ("m/key_missing_delete", "Cannot delete: no entry for timestamp=9999, tag=zz."),
    ("m/dup_in_batch", "Duplicate key in batch: timestamp=7000, tag=x."),
    ("m/errors_capped", "10"),
    ("r/illegal_group_by", "You must provie 'aggFunc' with 'groupBy'."),
    ("r/illegal_gt_ge", "Can't query 'gt' and 'ge' at the same time."),
    ("r/illegal_lt_le", "Can't query 'lt' and 'le' at the same time."),
    ("r/illegal_ts_eq", "Can't query 'tsEq' with any other timestamp condition."),
    ("r/no_data_tag", 'No data for tag "zz".'),
    ("r/key_exists", 'Timestamp = 1000 and tag = "a" already exists.'),
    ("r/key_missing", 'Timestamp = 9999 and tag = "zz" not found.'),
    (
        "w/rows",
        '[{"tag":"a","timestamp":1000,"value":1.5},'
        '{"tag":"a","timestamp":2000,"value":3.5},'
        '{"tag":"a","timestamp":3000,"value":5.0}]',
    ),
    ("w/groups", '[{"group":"a","result":10.0},{"group":"b","result":13.0}]'),
    ("w/scalar", '{"result":6.0}'),
    ("w/scalar_empty", '{"result":null}'),
]


def _canon(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def wire_error_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run every §2.5 error condition + the three wire shapes against a
    scratch :class:`TsdbEngine`; returns ``(kind, got)`` rows. The
    fixture is inherently tiny (a contract check, not a data-scale
    query), so the driver-side `createDataFrame` is bounded by the
    case-list length."""
    from timeseries_db_spark import wire
    from timeseries_db_spark.engine import TsdbEngine
    from timeseries_db_spark.operators.dml import DmlError
    from timeseries_db_spark.schema import Agg, GroupBy, QueryError, QueryModel

    path = os.path.join(tempfile.gettempdir(), f"tsdb_wire_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    eng = TsdbEngine(spark, path)
    eng.insert(_ROWS)

    def caught(fn) -> str:
        try:
            fn()
        except (QueryError, DmlError) as exc:
            return str(exc)
        return "<no error raised>"

    got: dict[str, str] = {}

    def error_cases(prefix: str) -> None:
        got[f"{prefix}/illegal_group_by"] = caught(
            lambda: QueryModel(group_by=GroupBy.TAG)
        )
        got[f"{prefix}/illegal_gt_ge"] = caught(lambda: QueryModel(gt=1, ge=2))
        got[f"{prefix}/illegal_lt_le"] = caught(lambda: QueryModel(lt=1, le=2))
        got[f"{prefix}/illegal_ts_eq"] = caught(lambda: QueryModel(ts_eq=1, gt=0))
        got[f"{prefix}/no_data_tag"] = caught(
            lambda: eng.query(QueryModel(tag_eq="zz"))
        )

    # modern mode (the default texts)
    error_cases("m")
    got["m/no_data_ts"] = caught(lambda: eng.query(QueryModel(ts_eq=12345)))
    got["m/no_data_tag_ts"] = caught(
        lambda: eng.query(QueryModel(tag_eq="a", ts_eq=12345))
    )
    got["m/avg_failed"] = caught(
        lambda: eng.query(QueryModel(agg_func=Agg.AVG, gt=5000))
    )
    got["m/key_exists"] = caught(lambda: eng.insert([(1000, "a", 9.9)]))
    got["m/key_missing_update"] = caught(lambda: eng.update([(9999, "zz", 1.0)]))
    got["m/key_missing_delete"] = caught(lambda: eng.delete([(9999, "zz")]))
    got["m/dup_in_batch"] = caught(
        lambda: eng.insert([(7000, "x", 1.0), (7000, "x", 2.0)])
    )
    # 12 intra-batch duplicate keys → 12 errors → capped at 10
    # (`take 10 errors`, Handlers.hs:55)
    capped_batch = [
        (8000 + i, "y", float(v)) for i in range(12) for v in (1, 2)
    ]
    try:
        eng.insert(capped_batch)
        got["m/errors_capped"] = "<no error raised>"
    except DmlError as exc:
        got["m/errors_capped"] = str(len(exc.errors))

    # reference mode (byte-exact HTTP 400 strings, typo included)
    wire.set_reference_wire(True)
    try:
        error_cases("r")
        got["r/key_exists"] = caught(lambda: eng.insert([(1000, "a", 9.9)]))
        got["r/key_missing"] = caught(lambda: eng.update([(9999, "zz", 1.0)]))
    finally:
        wire.set_reference_wire(False)

    # QueryR wire union (Model.hs:150-152) as canonical JSON
    got["w/rows"] = _canon(eng.query_json(QueryModel(tag_eq="a")))
    got["w/groups"] = _canon(
        eng.query_json(QueryModel(agg_func=Agg.SUM, group_by=GroupBy.TAG))
    )
    got["w/scalar"] = _canon(eng.query_json(QueryModel(agg_func=Agg.COUNT)))
    got["w/scalar_empty"] = _canon(
        eng.query_json(QueryModel(agg_func=Agg.SUM, gt=5000))
    )

    # every EXPECTED kind must be produced (a missing case would
    # otherwise shrink both sides in lockstep and pass vacuously)
    missing = [k for k, _ in EXPECTED if k not in got]
    if missing:
        raise RuntimeError(f"wire contract cases not exercised: {missing}")
    return spark.createDataFrame(
        [(k, got[k]) for k, _ in EXPECTED], "kind string, got string"
    )


def wire_error_contract_sql() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    values = ", ".join(f"({q(k)}, {q(v)})" for k, v in EXPECTED)
    return f"SELECT * FROM (VALUES {values}) AS t(kind, got)"


def register_wire(q: dict, o: dict) -> None:
    q["wire_error_contract"] = wire_error_contract
    o["wire_error_contract"] = wire_error_contract_sql()
