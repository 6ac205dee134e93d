"""Streaming Holt-Winters: a live level/trend/seasonal forecast per
key with O(period) state, snapshots pinned identical to the batch
``timeseries.holt_winters_fold`` on the same ordered prefix.

State machine per key:
- WARMUP: buffer (order, value) pairs until 2m points have arrived —
  the batch init (two-season level/trend, first-season seasonals)
  needs them verbatim;
- FOLD: after init, each row advances the recurrence in O(1) with the
  rotating m-element seasonal buffer; nothing is ever rescanned.

Ordering contract mirrors streaming_cusum: rows sort within a batch;
a cross-batch order violation flips ``in_order`` to false rather than
folding wrong silently. All arithmetic is Python ints with
TRUNCATE-toward-zero division (Spark DIV semantics — Python's ``//``
floors and diverges on the negative trends/seasonals this model
produces routinely).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, n_points long, phase string, "
                 "level_x1000 long, trend_x1000 long, "
                 "season_next_x1000 long, forecast_x1000 long, "
                 "in_order boolean")
_STATE_SCHEMA = ("phase int, buf_o array<long>, buf_v array<long>, "
                 "l long, b long, s array<long>, n long, max_o long, "
                 "ok boolean")


def _tdiv(x: int, y: int) -> int:
    q = abs(x) // abs(y)
    return q if (x >= 0) == (y >= 0) else -q


def _make_update(m: int, a: int, bb: int, g: int):
    def _init(xs):
        s1, s2 = sum(xs[:m]), sum(xs[m:2 * m])
        lv = _tdiv(s1 * 1000, m)
        tr = _tdiv((s2 - s1) * 1000, m * m)
        sbuf = [x * 1000 - lv for x in xs[:m]]
        return lv, tr, sbuf

    def _step(lv, tr, sbuf, x):
        sh = sbuf[0]
        ln = _tdiv(a * (x * 1000 - sh) + (1000 - a) * (lv + tr), 1000)
        tn = _tdiv(bb * (ln - lv) + (1000 - bb) * tr, 1000)
        sn = _tdiv(g * (x * 1000 - ln) + (1000 - g) * sh, 1000)
        return ln, tn, sbuf[1:] + [sn]

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            phase, buf_o, buf_v, lv, tr, sbuf, n, max_o, ok = state.get
            phase, lv, tr, n, max_o = (int(phase), int(lv), int(tr),
                                       int(n), int(max_o))
            buf_o = [int(x) for x in buf_o]
            buf_v = [int(x) for x in buf_v]
            sbuf = [int(x) for x in sbuf]
            ok = bool(ok)
        else:
            phase, buf_o, buf_v, lv, tr, sbuf = 0, [], [], 0, 0, []
            n, max_o, ok = 0, 0, True
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("o", kind="mergesort")
            for o, v in zip(pdf["o"].astype("int64"),
                            pdf["v"].astype("int64")):
                o, v = int(o), int(v)
                if n > 0 and o < max_o:
                    ok = False  # fold continues, flagged approximate
                max_o = max(max_o, o) if n > 0 else o
                n += 1
                if phase == 0:
                    buf_o.append(o)
                    buf_v.append(v)
                    if len(buf_v) == 2 * m:
                        lv, tr, sbuf = _init(buf_v)
                        for x in buf_v[m:]:
                            lv, tr, sbuf = _step(lv, tr, sbuf, x)
                        buf_o, buf_v = [], []
                        phase = 1
                else:
                    lv, tr, sbuf = _step(lv, tr, sbuf, v)
        state.update((phase, buf_o, buf_v, lv, tr, sbuf, n, max_o, ok))
        warm = phase == 0
        yield pd.DataFrame({
            "key": [key[0]], "n_points": [n],
            "phase": ["warmup" if warm else "fold"],
            "level_x1000": [0 if warm else lv],
            "trend_x1000": [0 if warm else tr],
            "season_next_x1000": [0 if warm else sbuf[0]],
            "forecast_x1000": [0 if warm else lv + tr + sbuf[0]],
            "in_order": [ok]})

    return update


def streaming_holt_winters(events: DataFrame, key_col: str,
                           order_col: str, value_col: str,
                           period: int, alpha_x1000: int = 300,
                           beta_x1000: int = 100,
                           gamma_x1000: int = 200) -> DataFrame:
    """Per-key Holt-Winters snapshots (update mode): one row per
    touched key per trigger; keep the max-n_points row per key, the
    convention shared by every streaming twin here."""
    tagged = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("v"))
    return tagged.groupBy("key").applyInPandasWithState(
        _make_update(int(period), int(alpha_x1000), int(beta_x1000),
                     int(gamma_x1000)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
