"""Independent pure-pandas oracle for the pipeline semantics.

Recomputes dedup -> route -> aggregate from first principles (no
Spark expressions reused) so tests compare two independent
implementations of the contract.
"""

from __future__ import annotations

import re

import pandas as pd

DEFAULT_MAX_LENGTH = 10**9


def dedup(turns: pd.DataFrame) -> pd.DataFrame:
    df = turns.sort_values(
        ["conv_id", "turn_idx", "ts", "text"],
        ascending=[True, True, False, False],
        kind="mergesort",
    )
    return df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")


def route(turns: pd.DataFrame, rules: list[tuple]) -> pd.DataFrame:
    """rules: (sink_name, expr, max_length, role_filter, enabled)."""
    out = []
    matched_any = pd.Series(False, index=turns.index)
    for sink, expr, max_len, role_filter, enabled in rules:
        if not enabled:
            continue
        expr = expr if expr is not None else "*"
        max_len = max_len if max_len is not None else DEFAULT_MAX_LENGTH
        m = pd.Series(True, index=turns.index)
        if expr != "*":
            rx = re.compile(expr)
            m &= turns["text"].map(lambda t: bool(rx.search(t)) if isinstance(t, str) else False)
        if role_filter:
            m &= turns["role"] == role_filter
        matched_any |= m
        sub = turns[m].copy()
        sub["sink_name"] = sink
        if max_len < DEFAULT_MAX_LENGTH:
            sub["text"] = sub["text"].str.slice(0, max_len)
        out.append(sub)
    un = turns[~matched_any].copy()
    un["sink_name"] = "_unrouted"
    out.append(un)
    return pd.concat(out, ignore_index=True)


def per_sink_counts(routed: pd.DataFrame) -> pd.DataFrame:
    g = routed.groupby("sink_name").agg(
        n_rows=("conv_id", "size"), n_distinct_conv=("conv_id", "nunique")
    )
    return g.reset_index().sort_values("sink_name").reset_index(drop=True)


def role_rollup(routed: pd.DataFrame) -> pd.DataFrame:
    g = routed.groupby(["sink_name", "role"]).size().rename("n_turns")
    return g.reset_index().sort_values(["sink_name", "role"]).reset_index(drop=True)
