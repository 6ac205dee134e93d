"""run_job.py CLI surface: --input-parquet external-input mode and the
JSON stats contract, exercised in-process against the active session."""

from __future__ import annotations

import json
import sys

from logging_spark import synth


def test_run_job_with_input_parquet(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo")
    import run_job

    inp = str(tmp_path / "turns")
    synth.transcripts(spark, n_conversations=40, turns_per_conv=10).write.parquet(inp)

    rc = run_job.main([
        "--warehouse", str(tmp_path / "wh"),
        "--input-parquet", inp,
        "--n-conversations", "40",   # sizes the synth lookup dim
        "--num-buckets", "8",
        "--snapshot", "cli-1",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["buckets_processed"] == 8
    assert stats["n_input_turns"] == spark.read.parquet(inp).count()
    sinks = stats["per_sink_counts"]
    assert "_unrouted" in sinks
    total_conv = max(s["n_distinct_conv"] for s in sinks.values())
    assert total_conv == 40
