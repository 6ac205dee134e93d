"""Regular-grid time-series operators: gap filling and LOCF.

Log/metric series are sparse — hours with zero events simply have no
row — but downstream consumers (rate alerting, charting, forecasting
features) need a REGULAR grid. `gapfill_hourly` densifies each key's
series over its own [min, max] hour span, and `locf` carries the last
observation forward across the filled gaps (the standard monotone
imputation for metrics like "last reported value").

Scale shape: the grid is generated per key with sequence() + explode —
a narrow flatMap whose output is (span_hours) rows per key, never a
cross join against a global calendar dimension. The left join back to
the observed buckets is an equi-join on (key, hour); LOCF is one
window per key (a single hash partition + sort — same wide dep the
per-key aggregate already paid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hourly_buckets(df: DataFrame, key_col: str, ts_col: str,
                   aggs: list[Column]) -> DataFrame:
    """Observed (key, hour) buckets with the caller's aggregates."""
    return (df.groupBy(F.col(key_col),
                       F.date_trunc("hour", F.col(ts_col)).alias("hour"))
            .agg(*aggs))


def gapfill_hourly(buckets: DataFrame, key_col: str,
                   zero_cols: list[str] | None = None) -> DataFrame:
    """Densify per-key hourly buckets over each key's own span.

    Missing hours appear with NULL aggregate columns, except
    `zero_cols` which are coalesced to 0 (counts / sums where absence
    means zero). Expects a `hour` timestamp column from
    hourly_buckets.
    """
    grid = (buckets.groupBy(key_col)
            .agg(F.min("hour").alias("_lo"), F.max("hour").alias("_hi"))
            .select(key_col,
                    F.explode(F.sequence(
                        "_lo", "_hi", F.expr("INTERVAL 1 HOUR")))
                    .alias("hour")))
    out = grid.join(buckets, [key_col, "hour"], "left")
    for c in zero_cols or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def locf(df: DataFrame, key_col: str, order_col: str, value_col: str,
         out_col: str | None = None) -> DataFrame:
    """Last-observation-carried-forward within each key, in order.
    Leading rows before the first observation stay NULL (there is
    nothing to carry) — callers needing a dense column coalesce a
    sentinel or seed value."""
    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(out_col or f"{value_col}_locf",
                         F.last(value_col, ignorenulls=True).over(w))


def ewma_fold(df: DataFrame, key: str, order_col: str, value_col: str,
              den: int = 4) -> DataFrame:
    """Per-key integer EWMA over an ordered series — the recursive
    smoother expressed as a HOF fold, no UDF and no per-row Python:
    s_0 = x_0, s_t = ((den-1)*s_{t-1} + x_t) DIV den. All terms stay
    non-negative for count series, so integral DIV (truncation) and
    floor agree and the fold is engine-portable (the oracle runs the
    same recurrence as a recursive CTE).

    The series is collected per key (collect_list + array_sort), so a
    key's full history must fit a row — fine for period-aggregated
    series (a decade of hourly points is ~90k longs). One shuffle on
    the key. Output: (key, n_points, final_ewma, peak_ewma)."""
    pts = (df.groupBy(key)
           .agg(F.expr(
               f"transform(array_sort(collect_list("
               f"struct({order_col} AS o, {value_col} AS v))), p -> p.v)")
               .alias("_xs")))
    fold = (
        f"aggregate(slice(_xs, 2, size(_xs) - 1), "
        f"named_struct('s', _xs[0], 'mx', _xs[0]), "
        f"(acc, x) -> named_struct("
        f"'s', ({den - 1} * acc.s + x) DIV {den}, "
        f"'mx', greatest(acc.mx, ({den - 1} * acc.s + x) DIV {den})))")
    return (pts.where(F.size("_xs") > 0)
            .select(key,
                    F.size("_xs").cast("long").alias("n_points"),
                    F.expr(f"CAST({fold}.s AS BIGINT)").alias("final_ewma"),
                    F.expr(f"CAST({fold}.mx AS BIGINT)").alias("peak_ewma")))


def cusum_fold(df: DataFrame, key: str, order_col: str, value_col: str,
               ref_col: str) -> DataFrame:
    """One-sided CUSUM change-point statistic per key, as a HOF fold:
    S_0 = max(0, x_0 - k), S_t = max(0, S_{t-1} + x_t - k) — the
    classic upward-shift detector (Page 1954). Tracks the peak S and
    its 1-based position (first-peak-wins), which localizes WHERE the
    rate shifted. Pure integer add/max (no division), so the fold is
    engine-portable; ``ref_col`` is the per-key reference level k
    (constant within a key — e.g. the key's integer mean rate).

    Same collect-per-key shape as ewma_fold: one shuffle, a key's
    series must fit a row. Output: (key, n_points, ref_k, peak_cusum,
    peak_pos)."""
    pts = (df.groupBy(key)
           .agg(F.expr(
               f"transform(array_sort(collect_list("
               f"struct({order_col} AS o, {value_col} AS v))), p -> p.v)")
               .alias("_xs"),
               F.first(ref_col).cast("long").alias("_k")))
    fold = (
        "aggregate(slice(_xs, 2, size(_xs) - 1), "
        "named_struct("
        "'s', greatest(0L, _xs[0] - _k), "
        "'peak', greatest(0L, _xs[0] - _k), "
        "'pos', 1L, 'i', 1L), "
        "(acc, x) -> named_struct("
        "'s', greatest(0L, acc.s + x - _k), "
        "'peak', greatest(acc.peak, greatest(0L, acc.s + x - _k)), "
        "'pos', IF(greatest(0L, acc.s + x - _k) > acc.peak,"
        " acc.i + 1, acc.pos), "
        "'i', acc.i + 1))")
    return (pts.where(F.size("_xs") > 0)
            .select(key,
                    F.size("_xs").cast("long").alias("n_points"),
                    F.col("_k").alias("ref_k"),
                    F.expr(f"CAST({fold}.peak AS BIGINT)")
                     .alias("peak_cusum"),
                    F.expr(f"CAST({fold}.pos AS BIGINT)")
                     .alias("peak_pos")))


def lag_moments(series: DataFrame, key_col: str, val_col: str,
                lags: list[int]) -> DataFrame:
    """Integer autocovariance MOMENTS of a regular integer series at
    each lag: (lag, n_pairs, sum_x, sum_y, sum_xy, sum_xx, sum_yy,
    cov_num) where cov_num = n*sum_xy - sum_x*sum_y (the exact
    integer covariance numerator; Pearson r = cov_num /
    sqrt((n*sxx - sx^2)(n*syy - sy^2)) is one float the CONSUMER
    computes — the engine-portable split used by every fixed-point
    stat here).

    Shape: one shifted-union of the (tiny, already-aggregated) series
    per lag, then one equi-join on the grid key and one grouped agg —
    distributed end to end, no single-partition ordering window, so
    the same plan holds when the series is per-entity x hourly at
    10^9 rows (add the entity to key_col upstream).
    """
    base = series.select(F.col(key_col).alias("_k"),
                         F.col(val_col).cast("long").alias("_x"))
    shifted = None
    for lag in lags:
        s = series.select(
            F.lit(lag).cast("int").alias("lag"),
            (F.col(key_col) + lag).alias("_k"),
            F.col(val_col).cast("long").alias("_y"))
        shifted = s if shifted is None else shifted.unionByName(s)
    j = base.join(shifted, "_k")
    return (j.groupBy("lag")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("_x").cast("long").alias("sum_x"),
                 F.sum("_y").cast("long").alias("sum_y"),
                 F.sum(F.col("_x") * F.col("_y")).cast("long")
                 .alias("sum_xy"),
                 F.sum(F.col("_x") * F.col("_x")).cast("long")
                 .alias("sum_xx"),
                 F.sum(F.col("_y") * F.col("_y")).cast("long")
                 .alias("sum_yy"))
            .withColumn("cov_num",
                        F.expr("n_pairs * sum_xy - sum_x * sum_y")))


def holt_fold(df: DataFrame, key: str, order_col: str, value_col: str,
              alpha_x1000: int = 300, beta_x1000: int = 100) -> DataFrame:
    """Per-key integer Holt (double-exponential) smoothing — level +
    trend — expressed as a HOF fold like ewma_fold: no UDF, no per-row
    Python, oracle-portable because every step is BIGINT add/mul/DIV
    (Spark DIV and DuckDB // both truncate toward zero, measured —
    see contract.py header).

    Fixed point x1000: l_1 = y_1*1000, b_1 = (y_1 - y_0)*1000, then
    for t >= 2
        l_t = (a*y_t*1000 + (1000-a)*(l + b)) DIV 1000
        b_t = (b*(l_t - l_{t-1}) + (1000-b)*b_{t-1}) DIV 1000
    (a = alpha_x1000, b = beta_x1000). Trend may go negative; trunc
    division is identical in both engines so the twins stay bit-equal.

    Same scale shape as ewma_fold: one shuffle on the key, a key's
    series must fit a row (period-aggregated series only). Output:
    (key, n_points, level_x1000, trend_x1000, forecast_x1000) where
    forecast = one-step-ahead l + b. Keys with < 2 points are dropped
    (no trend is defined)."""
    a, b = int(alpha_x1000), int(beta_x1000)
    pts = (df.groupBy(key)
           .agg(F.expr(
               f"transform(array_sort(collect_list("
               f"struct({order_col} AS o, {value_col} AS v))), p -> p.v)")
               .alias("_xs")))
    lnew = f"(({a} * x * 1000 + {1000 - a} * (acc.l + acc.b)) DIV 1000)"
    fold = (
        f"aggregate(slice(_xs, 3, size(_xs) - 2), "
        f"named_struct('l', _xs[1] * 1000, 'b', (_xs[1] - _xs[0]) * 1000), "
        f"(acc, x) -> named_struct("
        f"'l', {lnew}, "
        f"'b', ({b} * ({lnew} - acc.l) + {1000 - b} * acc.b) DIV 1000))")
    return (pts.where(F.size("_xs") >= 2)
            .select(key,
                    F.size("_xs").cast("long").alias("n_points"),
                    F.expr(f"CAST({fold}.l AS BIGINT)").alias("level_x1000"),
                    F.expr(f"CAST({fold}.b AS BIGINT)").alias("trend_x1000"),
                    F.expr(f"CAST({fold}.l + {fold}.b AS BIGINT)")
                     .alias("forecast_x1000")))


def trend_slope(df: DataFrame, key: str, x_col: str,
                y_col: str) -> DataFrame:
    """Per-key OLS trend slope over an integer series, exact-integer
    numerator/denominator split: slope = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2), reported with the x1e6 truncated quotient. ONE
    grouped aggregate (map-side combined); x is re-based to the key's
    own min via a same-key window (AQE reuses the window's hash
    partitioning, so the groupBy adds no second exchange).

    Overflow budget: with x re-based, |n*Sxx| <~ n^2 * span^2 / 3 —
    safe to ~50k points per key; past that consume the exact moments
    and divide downstream (the same rule as lag_moments/kappa).
    Slope may be negative: truncating DIV is engine-identical."""
    w = Window.partitionBy(key)
    based = df.select(
        F.col(key),
        (F.col(x_col) - F.min(x_col).over(w)).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"))
    agg = based.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").cast("long").alias("sx"),
        F.sum("_y").cast("long").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("sxx"))
    return agg.select(
        key, "n",
        F.expr("n * sxy - sx * sy").alias("slope_num"),
        F.expr("n * sxx - sx * sx").alias("slope_den"),
        F.expr("CASE WHEN n * sxx - sx * sx = 0 THEN 0 ELSE "
               "((n * sxy - sx * sy) * 1000000) DIV (n * sxx - sx * sx) "
               "END").alias("slope_x1e6"))


def naive_backtest(df: DataFrame, key: str, x_col: str, y_col: str,
                   season: int = 24) -> DataFrame:
    """Forecast backtest of the SEASONAL-naive model (y_hat = y at
    x-season) against the step-naive baseline (y at x-1), per key —
    the MASE-shaped sanity check run before any real forecaster ships.

    Sparse-grid exact: lags are equi-joins on (key, x-season) /
    (key, x-1), so a missing hour never silently pairs with the wrong
    predecessor (a positional ``lag()`` window would). A row is
    scored only where BOTH references exist. All three joins key on
    the same (key, x)-derived columns, so after the first shuffle the
    data is co-partitioned — two local joins, not three wide stages.

    Output per key: ``n_scored``, integer absolute-error sums for both
    models, and ``mase_x1e6 = (err_season * 1e6) DIV err_naive``
    (<1e6 means the seasonal model beats the baseline). Values must be
    integers (counts, cents); errors/sums are exact BIGINTs.
    """
    base = df.select(F.col(key), F.col(x_col).cast("long").alias("_x"),
                     F.col(y_col).cast("long").alias("_y"))
    # pin: base feeds itself + both lag sides — without it the
    # upstream period-aggregation subtree runs three times in one
    # plan (plan-audited: 3 scans -> 1). The input is the COLLAPSED
    # per-(key, period) series, so the checkpoint is small by
    # contract.
    base = base.localCheckpoint()
    sea = base.select(F.col(key),
                      (F.col("_x") + season).alias("_x"),
                      F.col("_y").alias("_ys"))
    stp = base.select(F.col(key), (F.col("_x") + 1).alias("_x"),
                      F.col("_y").alias("_yn"))
    scored = (base.join(sea, [key, "_x"]).join(stp, [key, "_x"])
              .select(F.col(key),
                      F.abs(F.col("_y") - F.col("_ys")).alias("_es"),
                      F.abs(F.col("_y") - F.col("_yn")).alias("_en")))
    agg = scored.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum("_es").cast("long").alias("err_season"),
        F.sum("_en").cast("long").alias("err_naive"))
    return agg.select(
        key, "n_scored", "err_season", "err_naive",
        F.expr("(err_season * 1000000) DIV greatest(err_naive, 1L)")
        .cast("long").alias("mase_x1e6"))
