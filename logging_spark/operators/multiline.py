"""Multiline log-record assembly: continuation lines -> one record.

Real container logs are not one-record-per-line: a Java/Python stack
trace or a wrapped message emits one START line (matching the log
grammar) followed by N continuation lines (indented, `at ...`,
`Caused by: ...`). The reference's file tail (SURVEY S1;
pkg/datasource/datasource.go follower loop) ships lines verbatim and
leaves re-assembly to the consumer — this operator is that consumer
step, the standard filebeat `multiline.pattern` semantic re-expressed
as a Spark plan.

Semantics: within each file (ordered by line number), every line
belongs to the most recent START line at-or-above it. Assembly is:

1. tag each line with `is_start` (default: line does NOT begin with
   whitespace — override with any boolean Column);
2. record id = running max of the start lines' line numbers — ONE
   window per file, `rows unbounded preceding`, no self-join and no
   iterative pass;
3. group by (file, record id): newline-join the lines in line order
   (collect_list of (line_no, text) structs + array_sort so the
   in-record order is deterministic under any partitioning).

Orphan continuation lines before the first start of a file get
record id -1 (the contract's NULL-free sentinel) instead of being
dropped — a tail that begins mid-record is normal on resume.

Scale shape: the window partitions by file, so the sort is per-file
and embarrassingly parallel across the corpus — no global order. The
groupBy reuses the same (file) clustering, and AQE coalesces the two
stages' exchanges when partitioning matches. At 100 TB the unit of
parallelism is the file, exactly like the text source that feeds it
(sources/textlog.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assemble_multiline(lines: DataFrame, file_col: str = "log_path",
                       line_col: str = "line_no", text_col: str = "line",
                       start: Column | None = None) -> DataFrame:
    """(file, record_line, n_lines, record_text): one row per
    assembled record. `record_line` is the start line's number (-1
    for a leading orphan run); `record_text` is the newline-joined
    record in file order."""
    is_start = start if start is not None else ~F.col(text_col).rlike(r"^\s")
    w = (Window.partitionBy(file_col).orderBy(line_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    rec = F.max(F.when(is_start, F.col(line_col))).over(w)
    tagged = lines.select(
        F.col(file_col),
        F.coalesce(rec, F.lit(-1)).cast("long").alias("record_line"),
        F.col(line_col).alias("_ln"), F.col(text_col).alias("_tx"))
    parts = F.array_sort(F.collect_list(F.struct("_ln", "_tx")))
    return (tagged.groupBy(file_col, "record_line")
            .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                 F.array_join(
                     F.transform(parts, lambda s: s["_tx"]), "\n")
                 .alias("record_text")))
