from timeseries_db_spark.plans.compiler import compile_query  # noqa: F401
