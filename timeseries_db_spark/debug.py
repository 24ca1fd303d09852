"""Per-leg failure attribution for union-folded gate entries.

The 50-entry registry folds parameter families into single entries with
a leg discriminator column (``kind`` / ``variant`` / ``tag``) — up to 6
legs per entry. The driver's CORRECTNESS gate hashes the WHOLE entry, so
a red row names only the entry, not the leg that broke (VERDICT r8 item
3). This module splits an entry's Spark result and its DuckDB oracle by
the discriminator and hash-compares per leg, so one run localizes any
future red row.

CLI::

    python -m timeseries_db_spark.debug <entry> [sf_dir]
    python -m timeseries_db_spark.debug --all [sf_dir]   # every entry
    python -m timeseries_db_spark.debug --walltime [sf_dir]
        # one-shot wall-time per entry (the driver's gate shape:
        # vanilla session, single run, full collect) sorted
        # most-expensive-first — the data that budget decisions like
        # "can this entry afford another leg" run on (r16, VERDICT
        # r15 item 7)

The comparison mirrors the driver's: columns sorted by name, doubles
rounded to 4 places, rows sorted, then one value hash per leg. Output is
one line per leg with rows / hash verdicts and, on mismatch, the first
few differing rows of each side.
"""

from __future__ import annotations

import hashlib

import pandas as pd

#: Discriminator candidates, most specific first. ``tag`` last: some
#: entries use it as a data column, but splitting on it still localizes
#: (each tag's slice is compared independently).
_LEG_COLS = ("kind", "variant", "tag")

_ALL = "<all>"


class _NullLeg:
    """Unique sentinel for NULL leg-discriminator values (r10 ADVICE
    follow-up): a plain ``'<null>'`` string would silently merge a
    genuine string leg value ``'<null>'`` with real NULLs. A singleton
    object can't collide with any data value; equality is identity."""

    def __repr__(self) -> str:  # shown in the per-leg report
        return "<null>"

    __str__ = __repr__


_NULL_LEG = _NullLeg()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-shaped canonical form: name-sorted columns, round(4) on
    floats, stable row order."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(4)
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(
        drop=True
    )


def _value_hash(pdf: pd.DataFrame) -> str:
    # csv of the normalized frame: format-stable across engines once
    # floats are rounded (NaN prints empty on both paths)
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.4f").encode()
    ).hexdigest()[:16]


def leg_column(columns) -> str | None:
    for c in _LEG_COLS:
        if c in columns:
            return c
    return None


def _align_dtypes(s: pd.DataFrame, o: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Engine-dtype seams (int64 vs float64 for nullable longs, object
    vs str) must not masquerade as value mismatches — the driver checks
    schemas separately; this harness localizes VALUE breaks."""
    s, o = s.copy(), o.copy()
    for c in s.columns:
        if c in o.columns and s[c].dtype != o[c].dtype:
            if s[c].dtype.kind in "if" and o[c].dtype.kind in "if":
                s[c] = s[c].astype("float64")
                o[c] = o[c].astype("float64")
            else:
                s[c] = s[c].astype(str)
                o[c] = o[c].astype(str)
    return s, o


def compare_legs(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, leg_col: str | None
) -> list[dict]:
    """Split both frames by ``leg_col`` and compare each slice; a None
    ``leg_col`` compares the whole entry as one leg. Returns one dict
    per leg: {leg, spark_rows, oracle_rows, rows_match, hash_match,
    spark_only, oracle_only} — the *_only fields carry up to 3 example
    rows present on one side only (empty when the leg matches)."""
    spark_pdf, oracle_pdf = _align_dtypes(spark_pdf, oracle_pdf)
    # NULL discriminator values get a sentinel leg instead of being
    # dropped (r10 ADVICE): dropna here would silently skip comparing
    # rows whose leg column is NULL — weaker than the driver's
    # whole-entry hash for entries that split on a nullable column.
    # _align_dtypes returned fresh copies, so the substitution below
    # never touches the caller's frames; the singleton sentinel can't
    # collide with a real string value (r11 ADVICE).
    if leg_col:
        for pdf in (spark_pdf, oracle_pdf):
            if pdf[leg_col].isna().any():
                pdf[leg_col] = (
                    pdf[leg_col]
                    .astype(object)
                    .where(pdf[leg_col].notna(), _NULL_LEG)
                )
    legs = sorted(
        set(spark_pdf[leg_col]) | set(oracle_pdf[leg_col])
        if leg_col
        else {_ALL},
        key=str,
    )
    out = []
    for leg in legs:
        s = spark_pdf if leg == _ALL else spark_pdf[spark_pdf[leg_col] == leg]
        o = oracle_pdf if leg == _ALL else oracle_pdf[oracle_pdf[leg_col] == leg]
        s, o = _normalize(s), _normalize(o)
        rows_match = len(s) == len(o)
        hash_match = rows_match and _value_hash(s) == _value_hash(o)
        rec = {
            "leg": leg,
            "spark_rows": len(s),
            "oracle_rows": len(o),
            "rows_match": rows_match,
            "hash_match": hash_match,
            "spark_only": [],
            "oracle_only": [],
        }
        if not hash_match:
            key = s.columns.tolist()
            merged = s.merge(o, how="outer", on=key, indicator=True)
            rec["spark_only"] = (
                merged[merged["_merge"] == "left_only"].head(3).to_dict("records")
            )
            rec["oracle_only"] = (
                merged[merged["_merge"] == "right_only"].head(3).to_dict("records")
            )
        out.append(rec)
    return out


def debug_entry(name: str, spark, sf_dir: str = "/root/testdata/sf0.01") -> list[dict]:
    """Run gate entry ``name`` AND its DuckDB oracle at ``sf_dir`` and
    compare leg by leg. Returns :func:`compare_legs` records (printed by
    the CLI); an entry without an oracle raises KeyError."""
    import duckdb

    from timeseries_db_spark.registry import build_registry

    q, o = build_registry()
    spark_pdf = q[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle_pdf = con.execute(o[name]).df()
    col = leg_column(set(spark_pdf.columns) & set(oracle_pdf.columns))
    return compare_legs(spark_pdf, oracle_pdf, col)


def _print_report(name: str, records: list[dict]) -> bool:
    ok = all(r["hash_match"] for r in records)
    print(f"== {name}: {'OK' if ok else 'MISMATCH'} ({len(records)} leg(s))")
    for r in records:
        mark = "ok " if r["hash_match"] else "RED"
        print(
            f"  [{mark}] leg={r['leg']!r} rows={r['spark_rows']}/"
            f"{r['oracle_rows']}"
        )
        for side in ("spark_only", "oracle_only"):
            for row in r[side]:
                row = {k: v for k, v in row.items() if k != "_merge"}
                print(f"        {side}: {row}")
    return ok


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    from timeseries_db_spark.registry import build_registry

    args = [a for a in argv if not a.startswith("--")]
    run_all = "--all" in argv
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    if "--walltime" in argv:
        import time as _time

        if args:  # --walltime [sf_dir] has no entry positional
            sf_dir = args[0]
        q, _o = build_registry()
        rows = []
        t_all = _time.perf_counter()
        for name in sorted(q):
            t0 = _time.perf_counter()
            n = len(q[name](spark, sf_dir).collect())
            rows.append((_time.perf_counter() - t0, name, n))
        total = _time.perf_counter() - t_all
        rows.sort(reverse=True)
        print(
            f"== one-shot gate wall-times at {sf_dir}"
            f" ({len(rows)} entries, total {total:.1f}s)"
        )
        for w, name, n in rows:
            print(f"  {w:8.2f}s  {name}  rows={n}")
        return 0
    names = sorted(build_registry()[0]) if run_all else [args[0]]
    ok = True
    for name in names:
        ok &= _print_report(name, debug_entry(name, spark, sf_dir))
    return 0 if ok else 1


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
