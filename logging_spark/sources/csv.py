"""CSV source/sink with explicit schema and dead-letter quarantine —
the delimiter-format sibling of sources/jsonl.py.

CSV is where ingest jobs die at scale: embedded delimiters, quotes,
newlines-in-quotes, ragged rows, silent type drift. The rules here
are the same as JSONL's, hardened for the format:

- EXPLICIT schema always (inference is a second full read at 100 TB
  and types drift on all-null partitions);
- PERMISSIVE + corrupt-record column: ragged/unparseable lines
  become quarantine rows, never job failures;
- `multiLine` stays OFF by default: quoted embedded newlines force
  Spark to parse a whole file in one task (unsplittable) — the
  round-trip writer escapes instead, precisely so readers keep
  file-splitting parallelism;
- timestamps pinned to the microsecond format (jsonl.TS_FORMAT —
  Spark's CSV default truncates to millis, same trap as to_json).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logging_spark.sources.jsonl import TS_FORMAT

CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',          # RFC 4180 doubled-quote escaping
    "timestampFormat": TS_FORMAT,
    "nullValue": "\\N",     # explicit NULL marker (mysqldump style)
}

# emptyValue is ASYMMETRIC (measured): on WRITE it is the literal
# emitted for '' — must be the QUOTED token '""' or the field is
# indistinguishable from a bare empty (which univocity reads as
# NULL); on READ the default already maps a quoted "" to '', and
# setting emptyValue='""' there would return the two-char string
# '""' instead. Hence separate write/read option dicts.
CSV_WRITE_OPTS = {**CSV_OPTS, "emptyValue": '""'}
CSV_READ_OPTS = {**CSV_OPTS, "emptyValue": ""}


def write_csv(df: DataFrame, path: str,
              n_shards: int | None = None) -> None:
    """Round-trippable CSV: RFC 4180 quoting, explicit NULL marker,
    microsecond timestamps. `n_shards` repartitions before the write
    (one file per shard, the write_shards discipline)."""
    w = df.repartition(n_shards) if n_shards else df
    (w.write.mode("overwrite").options(**CSV_WRITE_OPTS).csv(path))


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType | str,
             corrupt_col: str = "_corrupt_record") -> DataFrame:
    """Read CSV with an EXPLICIT schema; malformed rows land in
    `corrupt_col` (data columns null) instead of killing the job —
    route that column to the dead-letter sink downstream."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col and corrupt_col not in [f.name for f in schema.fields]:
        schema = schema.add(corrupt_col, T.StringType())
    return (spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .options(**CSV_READ_OPTS)
            .csv(path))


def quarantine_split(df: DataFrame,
                     corrupt_col: str = "_corrupt_record"
                     ) -> tuple[DataFrame, DataFrame]:
    """(clean, dead_letter): clean rows lose the corrupt column;
    dead-letter rows keep only the raw line for replay.

    The parse is cached first: Spark refuses corrupt-record-ONLY
    scans over raw files (QUERY_ONLY_CORRUPT_RECORD_COLUMN — column
    pruning would drop the very columns whose parse failure defines
    corruption), and the two halves must observe ONE parse anyway.
    At warehouse scale, land the parsed frame to a staging table and
    split from there instead of relying on the cache."""
    df = df.cache()
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    dead = (df.where(F.col(corrupt_col).isNotNull())
            .select(F.col(corrupt_col).alias("raw_line")))
    return clean, dead
