"""QueryModel → DataFrame compiler.

The reference compiles its ten-field query record straight to a single
monoid fold over one of two in-memory indexes (``Queries.hs:171-180``,
``Queries/Utils.hs:90-96``).  Here the same record compiles to a
declarative DataFrame chain and Catalyst supplies, for free, everything
the reference hand-rolled (SURVEY.md §4):

* timestamp-index PATRICIA-trie range pruning (``DataS/IntMap.hs:36-62``)
  → parquet predicate pushdown + row-group min/max skipping + partition
  pruning when the table is laid out time-partitioned;
* access-path selection (``Queries.hs:171-180``) → Catalyst scan
  planning — no custom rule;
* column pruning (value column in its own unboxed vector, ``Model.hs:94``)
  → parquet column projection;
* monoid partial aggregation (``Aggregates.hs:10-27``) →
  ``HashAggregateExec`` partial/final — the distributed generalization of
  the reference's ``Average {count,sum}`` monoid;
* lazy top-k (``Queries/TS.hs:21-24``) → ``TakeOrderedAndProject``.

Scale note (100 TB): every query below is a filter→agg pipeline whose
only shuffle is the group-by exchange; filters and the 1-3 column
projection reach the scan, so the engine reads only the pruned byte
range.  Group-by-tag on skewed tags relies on partial aggregation (map
side combines the skew away before the shuffle) + AQE skew handling.

Result shapes (``QueryR`` union, reference ``Model.hs:63-74``):

* rows    — ``(timestamp, tag, value)``  (no aggFunc)
* groups  — ``(grp, result)``            (aggFunc + groupBy)
* scalar  — ``(result,)``                (aggFunc alone)

``count`` is cast to double to match the reference's ``AggR.result :: Val``
(``Model.hs:66-67``, ``fromIntegral`` at ``Queries.hs:166``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timeseries_db_spark.schema import Agg, GroupBy, QueryError, QueryModel, Sort

#: Group-key output column. The reference calls it ``group`` (Model.hs:70);
#: we use ``grp`` to stay clear of the SQL keyword in oracle queries.
GROUP_COL = "grp"
RESULT_COL = "result"


def _agg_expr(agg: Agg) -> Column:
    if agg is Agg.COUNT:
        # count is a Double in the reference (Model.hs:66, Queries.hs:166)
        return F.count(F.lit(1)).cast("double")
    if agg is Agg.SUM:
        return F.sum("value")
    if agg is Agg.AVG:
        return F.avg("value")
    if agg is Agg.MIN:
        return F.min("value")
    if agg is Agg.MAX:
        return F.max("value")
    raise ValueError(f"unknown agg {agg}")


def filter_expr(qm: QueryModel) -> Column | None:
    """Range/point predicate — the nine bound combinations compiled by the
    reference's ``qmToF`` (``Queries/Utils.hs:21-30``) plus tag equality.
    Expressed as plain column comparisons so Catalyst pushes them into the
    parquet scan (the Spark replacement for index-subtree pruning)."""
    preds: list[Column] = []
    ts = F.col("timestamp")
    if qm.ts_eq is not None:
        preds.append(ts == F.lit(qm.ts_eq))
    else:
        if qm.gt is not None:
            preds.append(ts > F.lit(qm.gt))
        if qm.ge is not None:
            preds.append(ts >= F.lit(qm.ge))
        if qm.lt is not None:
            preds.append(ts < F.lit(qm.lt))
        if qm.le is not None:
            preds.append(ts <= F.lit(qm.le))
    if qm.tag_eq is not None:
        preds.append(F.col("tag") == F.lit(qm.tag_eq))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def compile_query(df: DataFrame, qm: QueryModel) -> DataFrame:
    """Compile ``qm`` against a tsdb-shaped DataFrame
    ``(timestamp:long, tag:string, value:double)``.

    Purely declarative — no action is triggered; callers that need the
    reference's data-dependent errors (``"No data for tag …"``,
    ``"Average failed."``) use :func:`run_query` which layers those checks.
    """
    pred = filter_expr(qm)
    if pred is not None:
        df = df.filter(pred)

    if qm.agg_func is None:
        # CollectR: raw rows, ordered by timestamp (reference O1); tag as
        # secondary key for a deterministic total order under `limit`
        # (reference order within equal timestamps is insertion order —
        # nondeterministic for our purposes).
        out = df.select("timestamp", "tag", "value")
        # (timestamp, tag, value) total order: (timestamp, tag) alone is a
        # key only under the tsdb uniqueness invariant — raw views built on
        # ms-truncated sources can carry ties, and a limit cutting through
        # a tie group must pick the same rows as the oracle
        keys = [F.col("timestamp"), F.col("tag"), F.col("value")]
        out = out.orderBy(
            *[k.asc() if qm.sort is Sort.ASC else k.desc() for k in keys]
        )
        if qm.limit is not None:
            # sort+limit → Catalyst TakeOrderedAndProject (distributed top-k,
            # no global sort materialization) — the scalable analog of the
            # reference's lazy-fold short-circuit (Queries/TS.hs:21-24).
            out = out.limit(max(0, qm.limit))  # take(-1) = [] in the reference
        return out

    if qm.group_by is None:
        # AggR: single scalar. Catalyst prunes the scan to the value column
        # (+ pushed filter columns) — the reference's unboxed-vector fast
        # path (queryVec, Queries.hs:160-169) falls out of column pruning.
        return df.agg(_agg_expr(qm.agg_func).alias(RESULT_COL))

    # [GroupAggR]: (grp, result) per group. Hash aggregate, partial+final;
    # empty groups never materialize (same semantics as the reference's
    # per-tag sub-index folds, Queries/Tag.hs:35-53).
    key = "tag" if qm.group_by is GroupBy.TAG else "timestamp"
    out = df.groupBy(F.col(key).alias(GROUP_COL)).agg(
        _agg_expr(qm.agg_func).alias(RESULT_COL)
    )
    # Reference sorts timestamp-keyed groups by traversal direction and
    # leaves tag-keyed groups in (nondeterministic) hash order; we always
    # order by group key for determinism (SURVEY.md §7.3).
    out = out.orderBy(
        F.col(GROUP_COL).asc() if qm.sort is Sort.ASC else F.col(GROUP_COL).desc()
    )
    if qm.limit is not None:
        out = out.limit(max(0, qm.limit))
    return out


def needs_presence_probe(qm: QueryModel) -> bool:
    """True when the reference's dispatch would consult an index lookup
    that can throw a presence error — the single source of truth shared
    by :func:`run_query` and the engine's probe construction.

    Reference routing (``Utils.hs:93-96`` ``qmToQT`` →
    ``Tag.hs:58-67`` / ``TS.hs:57-65``):

    * ``tagEq`` set → TagQuery → ``sIx[tag]`` lookup throws on a miss,
      for grouped and non-grouped queries alike;
    * ``tagEq`` absent but ``groupBy=tag`` → TagQuery's ``groupTag``,
      which never throws (a ``tsEq`` there is a ``mapMaybe`` filter —
      ``Tag.hs:49-53``);
    * otherwise (TSQuery) → ``tsEq`` set probes ``tIx[ts]``.
    """
    if qm.tag_eq is not None:
        return True
    return qm.ts_eq is not None and qm.group_by is not GroupBy.TAG


def run_query(
    df: DataFrame,
    qm: QueryModel,
    *,
    strict: bool = True,
    presence_df: DataFrame | None = None,
) -> DataFrame:
    """Compile and, when ``strict``, enforce the reference's data-dependent
    error contract (SURVEY.md §2.5) before returning the plan:

    * ``tsEq``/``tagEq`` miss → ``"No data for timestamp/tag …"``
      (``Queries/TS.hs:64``, ``Queries/Tag.hs:64,67``);
    * ``avg`` over an empty selection → ``"Average failed."``
      (``Queries/Utils.hs:66-69``).

    These checks cost an extra count job, so they are opt-in (strict) and
    never run in benchmarks — mirroring SURVEY.md §7.4's guidance.
    """
    out = compile_query(df, qm)
    if strict:
        # Presence errors are INDEX-MEMBERSHIP probes following the
        # reference's dispatch (see needs_presence_probe — tagEq probes
        # fire for GROUPED queries too, Tag.hs:61-67):
        # * tagEq probes sIx[tag] ignoring time bounds (Tag.hs:61-64);
        # * tagEq+tsEq then probes sIx[tag][ts] → the *timestamp* error
        #   (Tag.hs:65-67);
        # * tsEq without tagEq probes tIx[ts] only on the TS path, i.e.
        #   not when groupBy=tag (groupTag filters misses silently).
        # membership probes must see the WHOLE table — callers that hand
        # in a pre-pruned df (e.g. the engine's manifest-bounded read)
        # supply the unpruned relation separately
        probe_df = presence_df if presence_df is not None else df

        def exists(pred) -> bool:
            return probe_df.filter(pred).limit(1).count() > 0

        from timeseries_db_spark import wire

        tag_c, ts_c = F.col("tag"), F.col("timestamp")
        if qm.tag_eq is not None:
            if not exists(tag_c == F.lit(qm.tag_eq)):
                raise QueryError(wire.no_data_tag(qm.tag_eq))
            if qm.ts_eq is not None and not exists(
                (tag_c == F.lit(qm.tag_eq)) & (ts_c == F.lit(qm.ts_eq))
            ):
                raise QueryError(wire.no_data_ts(qm.ts_eq))
        elif needs_presence_probe(qm):  # tag_eq is None here → the ts path
            if not exists(ts_c == F.lit(qm.ts_eq)):
                raise QueryError(wire.no_data_ts(qm.ts_eq))
        # avg over an empty (range-filtered) selection → the monoid fold
        # has no identity → "Average failed." (Utils.hs:66-69). Grouped
        # avg never errors: empty groups simply don't materialize
        # (`fromMaybe 0 . getAverage` on the toQRG path, Queries.hs:150).
        if qm.agg_func is Agg.AVG and qm.group_by is None:
            pred = filter_expr(qm)
            if (df.filter(pred) if pred is not None else df).limit(1).count() == 0:
                raise QueryError(wire.avg_failed())
    return out
