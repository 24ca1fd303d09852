"""Per-leg failure attribution harness (timeseries_db_spark/debug.py,
VERDICT r8 item 3): a red driver row on a union-folded entry must be
localizable to the leg that broke, in one run."""

import pandas as pd
import pytest

from timeseries_db_spark import debug

SF = "/root/testdata/sf0.001"


def test_compare_legs_localizes_the_broken_leg():
    """Synthetic 3-leg entry with exactly one corrupted leg: the report
    must flag that leg RED (with example rows) and the other two ok."""
    base = pd.DataFrame(
        {
            "grp": ["a", "b"] * 3,
            "result": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "kind": ["x", "x", "y", "y", "z", "z"],
        }
    )
    broken = base.copy()
    broken.loc[broken["kind"] == "y", "result"] += 0.5
    recs = {r["leg"]: r for r in debug.compare_legs(broken, base, "kind")}
    assert recs["x"]["hash_match"] and recs["z"]["hash_match"]
    assert not recs["y"]["hash_match"]
    assert recs["y"]["rows_match"]  # counts agree — it's a VALUE break
    assert recs["y"]["spark_only"] and recs["y"]["oracle_only"]


def test_compare_legs_localizes_a_missing_row():
    base = pd.DataFrame(
        {"v": [1.0, 2.0, 3.0], "variant": ["p", "p", "q"]}
    )
    short = base.iloc[:2]  # leg q lost its row
    recs = {r["leg"]: r for r in debug.compare_legs(short, base, "variant")}
    assert recs["p"]["hash_match"]
    assert not recs["q"]["rows_match"] and not recs["q"]["hash_match"]


def test_compare_legs_tolerates_engine_dtype_seams():
    """int64 vs float64 (a nullable long crossing toPandas) must not
    read as a value mismatch."""
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64"), "kind": ["k"] * 2})
    b = pd.DataFrame({"n": [1.0, 2.0], "kind": ["k"] * 2})
    (rec,) = debug.compare_legs(a, b, "kind")
    assert rec["hash_match"]


def test_compare_legs_null_discriminator_rows_still_compared():
    """r10 ADVICE: a mismatch confined to NULL-discriminator rows must
    surface as a red '<null>' sentinel leg, not silently vanish from
    the report (the driver's whole-entry hash would catch it)."""
    base = pd.DataFrame(
        {
            "v": [1.0, 2.0, 3.0, 4.0],
            "tag": ["t1", "t1", None, None],
        }
    )
    broken = base.copy()
    broken.loc[broken["tag"].isna(), "v"] += 0.5  # only null-keyed rows
    recs = {r["leg"]: r for r in debug.compare_legs(broken, base, "tag")}
    assert recs["t1"]["hash_match"]
    null_leg = debug._NULL_LEG
    assert null_leg in recs and not recs[null_leg]["hash_match"]
    # and a fully-green frame with null keys reports the sentinel green
    recs2 = {r["leg"]: r for r in debug.compare_legs(base, base.copy(), "tag")}
    assert recs2[null_leg]["hash_match"] and recs2["t1"]["hash_match"]


def test_compare_legs_null_sentinel_no_string_collision():
    """r11 ADVICE: a *real* string leg value '<null>' must stay a
    distinct leg from genuine NULLs — the sentinel is a singleton
    object, not a spellable string."""
    a = pd.DataFrame({"v": [1.0, 2.0], "tag": ["<null>", None]})
    b = pd.DataFrame({"v": [1.0, 9.0], "tag": ["<null>", None]})
    recs = {r["leg"]: r for r in debug.compare_legs(a, b, "tag")}
    assert len(recs) == 2
    assert recs["<null>"]["hash_match"]  # the string leg, untouched
    assert not recs[debug._NULL_LEG]["hash_match"]  # the real-NULL leg
    # and the caller's frames were not mutated by the substitution
    assert a["tag"].isna().sum() == 1 and (a["tag"] == "<null>").sum() == 1


def test_leg_column_priority():
    assert debug.leg_column({"kind", "tag", "x"}) == "kind"
    assert debug.leg_column({"variant", "tag"}) == "variant"
    assert debug.leg_column({"tag"}) == "tag"
    assert debug.leg_column({"grp", "result"}) is None


@pytest.mark.parametrize("name", ["sessionize_30m", "gapfill_hourly"])
def test_debug_entry_green_on_real_multileg_entries(spark, name):
    """Integration: the harness runs a real union-folded gate entry and
    its oracle end-to-end and reports every leg green."""
    recs = debug.debug_entry(name, spark, SF)
    assert len(recs) >= 2  # genuinely multi-leg
    assert all(r["hash_match"] for r in recs), recs
