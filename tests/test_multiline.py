"""Multiline record assembly (operators/multiline.py): stack-trace
continuation lines fold into their start line's record; leading
orphans get the -1 sentinel; works on real files via the textlog
source."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logging_spark.operators.multiline import assemble_multiline
from logging_spark.sources.textlog import read_log_files


def _lines(spark, rows):
    return spark.createDataFrame(rows, "log_path string, line_no long, line string")


def test_assembles_records_in_order(spark):
    rows = [("f", 1, "[ERROR] boom"),
            ("f", 2, "    at a()"),
            ("f", 3, "    at b()"),
            ("f", 4, "[INFO] fine"),
            ("g", 1, "[WARN] slow")]
    out = {(r["log_path"], r["record_line"]): r
           for r in assemble_multiline(_lines(spark, rows)).collect()}
    assert out[("f", 1)]["record_text"] == "[ERROR] boom\n    at a()\n    at b()"
    assert out[("f", 1)]["n_lines"] == 3
    assert out[("f", 4)]["n_lines"] == 1
    assert out[("g", 1)]["record_text"] == "[WARN] slow"


def test_leading_orphans_get_sentinel(spark):
    rows = [("f", 1, "    at tail-of-previous()"),
            ("f", 2, "    at more()"),
            ("f", 3, "[INFO] first full record")]
    out = {r["record_line"]: r
           for r in assemble_multiline(_lines(spark, rows)).collect()}
    assert out[-1]["n_lines"] == 2
    assert out[-1]["record_text"].startswith("    at tail")
    assert out[3]["n_lines"] == 1


def test_custom_start_predicate(spark):
    # filebeat-style: records start at lines matching a timestamp-ish
    # prefix; everything else continues
    rows = [("f", 1, "2024-01-01 ok"),
            ("f", 2, "wrapped"),
            ("f", 3, "2024-01-02 next")]
    out = assemble_multiline(
        _lines(spark, rows),
        start=F.col("line").rlike(r"^\d{4}-")).collect()
    n = {r["record_line"]: r["n_lines"] for r in out}
    assert n == {1: 2, 3: 1}


def test_end_to_end_from_log_files(spark, tmp_path):
    base = str(tmp_path / "logs")
    os.makedirs(f"{base}/svc-a", exist_ok=True)
    with open(f"{base}/svc-a/pod-1.log", "w") as f:
        f.write("[ERROR] comp-1: boom code=500 k=a\n"
                "    at handler()\n"
                "    at main()\n"
                "[INFO] comp-1: ok code=1 k=b\n")
    lines = (read_log_files(spark, f"{base}/*")
             .select("log_path", F.lit(None).cast("long").alias("line_no"),
                     F.col("value").alias("line")))
    # the text source has no line number column: derive one per file
    # from a per-file window over the natural read order via
    # monotonically_increasing_id (stable within a single-file split)
    lines = lines.withColumn("line_no", F.monotonically_increasing_id())
    out = assemble_multiline(lines).orderBy("record_line").collect()
    assert [r["n_lines"] for r in out] == [3, 1]
    assert out[0]["record_text"].count("\n") == 2
