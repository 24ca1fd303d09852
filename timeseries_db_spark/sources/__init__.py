from timeseries_db_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    events_as_tsdb,
    lineitem_as_tsdb,
    write_tsdb_partitioned,
)
