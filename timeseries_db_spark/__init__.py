"""timeseries_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of adrianotm/timeseries-db, rebuilt
Spark-first (DataFrame/SQL + Catalyst + Structured Streaming).

The reference (read-only at /root/reference) is a ~900-LoC in-RAM Haskell
time-series DB: one fixed-schema table ``(timestamp, tag, value)``, two
in-memory indexes, and a single query endpoint with ten composable
parameters (see /root/repo/SURVEY.md).  This package re-expresses that
capability surface — plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns, streaming
ingest) — on top of Spark's declarative engine, letting Catalyst/Tungsten
supply the physical optimizations the reference hand-rolled
(index range pruning → parquet predicate pushdown; monoid partial
aggregation → HashAggregateExec partial/final; parBuffer group sparks →
shuffle-partitioned hash aggregation).
"""

from timeseries_db_spark.schema import (  # noqa: F401
    TS_SCHEMA,
    Agg,
    GroupBy,
    IllegalQueryError,
    QueryError,
    QueryModel,
    Sort,
)
from timeseries_db_spark.engine import TsdbEngine  # noqa: F401
from timeseries_db_spark.plans.compiler import compile_query  # noqa: F401
from timeseries_db_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
