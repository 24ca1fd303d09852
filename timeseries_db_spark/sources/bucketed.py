"""Bucketed-table layout for co-located fact-fact joins.

The one big-data exchange left in the join family (`operators/joins.py`)
is the lineitem⋈orders orderkey shuffle. Bucketing BOTH tables on the
join key at write time (`bucketBy(n, key).sortBy(key)`) records the
hash-partitioned, sorted layout in the catalog, so Catalyst plans the
join as a zero-shuffle (and zero-sort) sort-merge over matching bucket
files — the shuffle is paid ONCE at ingest instead of per query.

This is the 100 TB answer for any join/aggregation key that is queried
repeatedly: at 1000 executors the per-query orderkey exchange is the
bottleneck; with both tables bucketed the join is embarrassingly
parallel per bucket pair. Pick ``n_buckets`` ≈ cluster cores × small
factor so one bucket pair fits a task (buckets also bound AQE's skew
handling; a hot orderkey range stays one bucket, so choose a high-NDV
key — orderkey qualifies).

Spark requires bucketed tables to live in the catalog (bucket metadata
is catalog state, not parquet metadata), so these helpers write
``saveAsTable`` external tables at an explicit path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Write ``df`` as an external bucketed+sorted table ``name`` at
    ``path`` (replacing any previous definition) and return the catalog
    relation carrying the bucket layout."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    *,
    left_name: str,
    right_name: str,
    left_key: str,
    right_key: str,
    base_path: str,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Bucket two join sides on their join keys with the SAME bucket
    count (the co-location requirement) and return the catalog
    relations; joining them on the keys needs no exchange and no sort."""
    lt = write_bucketed(left, left_name, f"{base_path}/{left_name}", left_key, n_buckets)
    rt = write_bucketed(right, right_name, f"{base_path}/{right_name}", right_key, n_buckets)
    return lt, rt
