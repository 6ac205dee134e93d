"""Event-sequence pattern matching (MATCH_RECOGNIZE-lite).

Encode each key's event history as a string — one deterministic
single-char code per event, ordered by (ts, event_id) — and match
regular expressions against it. Regex over the coded sequence is the
lightweight form of SQL MATCH_RECOGNIZE / CEP pattern syntax and
strictly generalizes the ordered funnel (operators/funnel.py):
'S.*C.*P' is the signup→click→purchase funnel, 'E{3,}' is three
consecutive errors, '(CV)+$' is a trailing click/view loop.

Scale shape: ONE hash aggregate per key builds the sequence
(collect_list + sort_array — per-key state is that key's event count,
the same bound sessionization carries), then the regex runs per KEY,
not per event. Pattern evaluation is a codegen rlike over short
strings. For keys with unbounded histories, window the input first
(e.g. events in the trailing N days) — a true streaming CEP engine
would cap state the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _code(type_col: str, alphabet: dict[str, str]) -> Column:
    out = F.lit("?")
    for k, v in alphabet.items():
        out = F.when(F.col(type_col) == k, F.lit(v)).otherwise(out)
    return out


def event_sequences(events: DataFrame, alphabet: dict[str, str],
                    key_col: str = "user_id", ts_col: str = "ts",
                    order_col: str = "event_id",
                    type_col: str = "event_type") -> DataFrame:
    """(key, seq): each key's full event history as a coded string,
    total-ordered by (ts, order_col). Unmapped types code as '?' so
    patterns can still anchor around them."""
    step = F.struct(
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_o"),
        _code(type_col, alphabet).alias("_c"),
    )
    return (events.groupBy(F.col(key_col).alias("key"))
            .agg(F.array_join(
                F.transform(F.sort_array(F.collect_list(step)),
                            lambda s: s.getField("_c")),
                "").alias("seq")))


def sequence_pattern_matches(events: DataFrame, pattern: str,
                             alphabet: dict[str, str],
                             key_col: str = "user_id", ts_col: str = "ts",
                             order_col: str = "event_id",
                             type_col: str = "event_type") -> DataFrame:
    """(key, seq) for keys whose coded history matches `pattern`
    (unanchored Java regex, as rlike)."""
    seqs = event_sequences(events, alphabet, key_col=key_col,
                           ts_col=ts_col, order_col=order_col,
                           type_col=type_col)
    return seqs.where(F.col("seq").rlike(pattern))
