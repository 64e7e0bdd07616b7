from lynx_spark.plans.analytics import REGISTRY, oracle_sql, queries  # noqa: F401
