from logging_spark.functions.parse import parse_turns, parsed_udf  # noqa: F401
