from lynx_spark.sources.tables import TABLES, load_table, register_all  # noqa: F401
