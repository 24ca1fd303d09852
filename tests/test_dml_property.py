"""Model-based DML check: random batch sequences applied to TsTable and
to a plain dict model must agree on the final snapshot, including which
batches are rejected (all-or-nothing semantics)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from timeseries_db_spark.operators.dml import DmlError, TsTable
from timeseries_db_spark.schema import TS_SCHEMA

T0 = 1704067200000
DAY = 86_400_000

# small key domain so collisions (the interesting case) are frequent
keys = st.tuples(
    st.sampled_from([T0, T0 + 1, T0 + 2, T0 + DAY, T0 + DAY + 1]),
    st.sampled_from(["a", "b", "c"]),
)
values = st.sampled_from([1.0, 2.5, -3.0])

ops = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.lists(st.tuples(keys, values), min_size=1, max_size=3),
    ),
    min_size=1,
    max_size=5,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(t), str(g), float(v)) for (t, g), v in rows], TS_SCHEMA
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(script=ops)
def test_random_dml_script_matches_model(spark, tmp_path_factory, script):
    path = str(tmp_path_factory.mktemp("dmlprop") / "t")
    table = TsTable.create(spark, path)
    model: dict[tuple[int, str], float] = {}

    for op, rows in script:
        batch_keys = [k for k, _ in rows]
        dup_in_batch = len(set(batch_keys)) < len(batch_keys)
        if op == "insert":
            valid = not dup_in_batch and all(k not in model for k in batch_keys)
        elif op == "update":
            # duplicate keys in an unordered batch are ambiguous → rejected
            valid = not dup_in_batch and all(k in model for k in batch_keys)
        else:  # delete is idempotent within a batch
            valid = all(k in model for k in batch_keys)

        if op == "insert":
            action = lambda: table.insert(_df(spark, rows))
        elif op == "update":
            action = lambda: table.update(_df(spark, rows))
        else:
            action = lambda: table.delete(_df(spark, rows).select("timestamp", "tag"))

        if valid:
            action()
            for (t, g), v in rows:
                if op == "insert" or op == "update":
                    model[(t, g)] = v
                else:
                    model.pop((t, g), None)
        else:
            with pytest.raises(DmlError):
                action()
            # all-or-nothing: model unchanged

        got = {
            (r["timestamp"], r["tag"]): r["value"] for r in table.read().collect()
        }
        assert got == model, (op, rows)


# ---- versioning surface (r8): the model keeps a HISTORY of snapshots so
# restore/truncate/changes can be checked against it ----

vops = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["insert", "update", "delete"]),
            st.lists(st.tuples(keys, values), min_size=1, max_size=3),
        ),
        st.tuples(st.just("truncate"), st.just([])),
        st.tuples(st.just("restore"), st.integers(min_value=0, max_value=6)),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(script=vops)
def test_random_versioning_script_matches_model(spark, tmp_path_factory, script):
    """Random interleavings of DML, truncate, and restore must track a
    snapshot-history model exactly: the final table equals the model,
    every retained version time-travels to its model snapshot, and
    changes(u, v) replayed over the model's u-snapshot yields the
    v-snapshot."""
    path = str(tmp_path_factory.mktemp("verprop") / "t")
    table = TsTable.create(spark, path, auto_compact_commits=0)
    snapshots: list[dict] = [{}]  # snapshots[v] = model at version v
    model: dict[tuple[int, str], float] = {}

    for op, arg in script:
        if op == "truncate":
            table.truncate()
            model = {}
        elif op == "restore":
            v = min(arg, table.version())
            table.restore(v)
            model = dict(snapshots[v])
        else:
            rows = arg
            batch_keys = [k for k, _ in rows]
            dup = len(set(batch_keys)) < len(batch_keys)
            if op == "insert":
                valid = not dup and all(k not in model for k in batch_keys)
            elif op == "update":
                valid = not dup and all(k in model for k in batch_keys)
            else:
                valid = all(k in model for k in batch_keys)
            if not valid:
                with pytest.raises(DmlError):
                    getattr(table, op)(
                        _df(spark, rows)
                        if op != "delete"
                        else _df(spark, rows).select("timestamp", "tag")
                    )
                continue  # rejected: no new version, no model change
            if op == "delete":
                table.delete(_df(spark, rows).select("timestamp", "tag"))
                for k, _ in rows:
                    model.pop(k, None)
            else:
                getattr(table, op)(_df(spark, rows))
                for k, v_ in rows:
                    model[k] = v_
        snapshots.append(dict(model))
        assert table.version() == len(snapshots) - 1

    # final state, every retained version, and the change feed all agree
    read = lambda v=None: {  # noqa: E731
        (r["timestamp"], r["tag"]): r["value"]
        for r in (table.read(v) if v is not None else table.read()).collect()
    }
    assert read() == model
    for v, snap in enumerate(snapshots):
        assert read(v) == snap, f"time travel to v{v}"
    u, v = 0, len(snapshots) - 1
    replayed = dict(snapshots[u])
    for r in table.changes(u, v).collect():
        k = (r["timestamp"], r["tag"])
        if r["change"] == "delete":
            replayed.pop(k)
        else:
            replayed[k] = r["value_after"]
    assert replayed == snapshots[v], "change feed replay"
