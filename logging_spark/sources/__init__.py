from logging_spark.sources.catalog import Catalog  # noqa: F401
