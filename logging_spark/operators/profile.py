"""One-pass column profiling: the data-quality audit table.

(column, n_rows, n_null, n_distinct) per profiled column — the
summary every ingestion pipeline publishes next to a new snapshot
(null regressions and cardinality cliffs are how schema drift and
join-key corruption actually surface).

Plan shape: ONE aggregate over the scan computes every null counter
plus all distinct counts; Spark plans multiple DISTINCT aggregates as
a single Expand (one row duplicated per distinct column) + two hash
aggregates — one pass over the data, no per-column scans. The long
(column, metric) layout comes from a zero-cost stack over the 1-row
wide result. For 10^12-row tables swap count_distinct for
approx_count_distinct (HLL) per column — same plan, constant memory —
and keep the exact form for audit snapshots of bounded dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct) per column, exact."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("long").alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_null, n_distinct)",
        "_n AS n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct")


def equidepth_histogram(
    df: DataFrame,
    value_col: str = "value",
    n_buckets: int = 8,
) -> DataFrame:
    """(bucket, n): equi-depth histogram via exact percentile edges —
    bucket b holds values in (edge_{b-1}, edge_b].

    Scale shape: NO global sort window (the naive ntile plan is a
    single-partition sort — the exact anti-pattern a 10^12-row table
    cannot pay). Instead one aggregate computes the n_buckets-1
    interior percentile edges, the edges broadcast back, and bucket
    assignment is a pure per-row comparison sum feeding an ordinary
    groupBy. percentile() interpolation is bitwise-identical to
    DuckDB's quantile_cont (established by the Hampel/anomaly family),
    so the bucket boundaries are engine-portable; counts differ from
    perfect N/k only by ties at the edges, deterministically on both
    engines."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    edges = df.where(F.col(value_col).isNotNull()).agg(
        F.percentile(F.col(value_col), F.array(*[F.lit(f) for f in fracs]))
        .alias("_edges"))
    bucket = (F.lit(1) + F.aggregate(
        F.col("_edges"), F.lit(0),
        lambda acc, e: acc + F.when(F.col(value_col) > e, 1).otherwise(0)
    )).cast("int")
    return (df.where(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(edges))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n")))


def ecdf_normalize(
    df: DataFrame,
    value_col: str = "value",
    num_partitions: int | None = None,
) -> DataFrame:
    """(value_col, n_rows, cum_below, pct_ppm): the exact empirical
    CDF of a column — each distinct value mapped to the count of rows
    strictly below it and its percentile in parts-per-million
    (floor(cum_below * 1e6 / n), integer-exact). The quantile
    normalization every quality-score mixer needs ("keep the top 30%
    by score" must mean the same thing across corpora with different
    score scales).

    Scale shape: the naive spelling — cume_dist()/a running sum OVER
    (ORDER BY value) — funnels the table through ONE task. Instead:
      1. aggregate counts per distinct value (one shuffle; output is
         |distinct|-bounded, never |rows|);
      2. range-partition + sort the distinct-counts frame (parallel
         sort, same physical shape as ORDER BY), localCheckpoint to
         pin partition bounds across the two downstream actions;
      3. per-partition totals -> exclusive offsets on the driver
         (one tiny collect, one row per partition);
      4. an Arrow cumsum kernel seeded with each partition's offset
         emits the exclusive prefix per value.
    The same two-phase prefix sum as sample.budget_head, applied to
    the distinct-value frame instead of the corpus."""
    from pyspark.sql.types import LongType, StructField, StructType

    counts = (df.where(F.col(value_col).isNotNull())
              .groupBy(value_col)
              .agg(F.count(F.lit(1)).alias("n_rows")))
    parted = (counts.repartitionByRange(num_partitions, value_col)
              if num_partitions else counts.repartitionByRange(value_col))
    d = parted.sortWithinPartitions(value_col).localCheckpoint()

    totals = (d.groupBy(F.spark_partition_id().alias("_pid"))
              .agg(F.sum("n_rows").alias("_t")).collect())
    offsets: dict[int, int] = {}
    run = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = run
        run += int(row["_t"])
    n_total = run

    schema = StructType(d.schema.fields
                        + [StructField("cum_below", LongType()),
                           StructField("pct_ppm", LongType())])

    def kernel(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        total = offsets.get(pid, 0)
        for pdf in batches:
            inclusive = pdf["n_rows"].cumsum().astype("int64") + total
            below = inclusive - pdf["n_rows"].astype("int64")
            total = int(inclusive.iloc[-1]) if len(inclusive) else total
            yield pdf.assign(
                cum_below=below,
                pct_ppm=(below * 1_000_000) // n_total)

    return d.mapInPandas(kernel, schema)


def gini_by_group(df: DataFrame, group_col: str, value_col: str,
                  tiebreak_col: str) -> DataFrame:
    """Gini concentration of a positive integer mass per group — the
    inequality readout for corpus balance ("does one doc hold half of
    src3's tokens?"). Exact integer rank formula
    ``gini = (2*sum(r_i*x_i) - (n+1)*sum(x)) / (n*sum(x))`` over
    ranks from one per-group sort (row_number with a deterministic
    tiebreak; with tied values this is the tiebreak-ordered variant,
    bit-reproducible rather than the averaged-rank textbook form).
    BIGINT-exact while n^2 * max(x) < 2^63 per group (~3e6 docs of
    1e6 tokens); past that, rescale x to coarser units first.

    One window sort + one grouped agg per group's rows — no
    all-pairs |x_i - x_j| expansion (the naive O(n^2) definition this
    rank identity replaces).
    """
    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    ranked = df.select(
        F.col(group_col), F.col(value_col).cast("long").alias("_x"),
        F.row_number().over(w).cast("long").alias("_r"))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x").cast("long").alias("total"),
        F.sum(F.col("_r") * F.col("_x")).cast("long").alias("_rx"))
    return agg.select(
        group_col, "n", "total",
        F.expr("CASE WHEN n * total = 0 THEN 0 ELSE "
               "((2 * _rx - (n + 1) * total) * 1000000) "
               "DIV (n * total) END").cast("long").alias("gini_x1e6"))


def length_emd(df: DataFrame, group_col: str, value_col: str,
               bin_width: int) -> DataFrame:
    """1-D earth-mover's distance (in ppm of mass) between each
    group's binned value distribution and the GLOBAL one — the
    transport-metric drift readout (chi-square penalizes overlap
    mismatch; EMD penalizes how FAR mass moved). For sorted 1-D
    histograms EMD is exactly ``sum over bins |cum_share_g -
    cum_share_all|`` — all integer once shares are ppm.

    Everything collapses to (group x bin) cells before any window;
    the bin grid is densified (groups missing a bin still carry
    cumulative mass) by a broadcast cross of the two tiny distinct
    sets. Output per group: n_rows, n_bins, emd_ppm_bins (sum over
    bins of |cum diff|; divide by n_bins-1 downstream for a [0,1e6]
    normalization if wanted — kept raw here to stay integer-exact).
    """
    binned = df.select(
        F.col(group_col).alias("g"),
        F.expr(f"CAST({value_col} AS BIGINT) DIV {bin_width}")
        .alias("b"))
    cells = (binned.groupBy("g", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("c"))
             .localCheckpoint())  # feeds grid, totals, global
    grid = (cells.select("g").distinct()
            .crossJoin(F.broadcast(cells.select("b").distinct())))
    dense = (grid.join(cells, ["g", "b"], "left")
             .select("g", "b", F.coalesce("c", F.lit(0)).alias("c")))
    gtot = cells.groupBy("g").agg(F.sum("c").cast("long").alias("tg"))
    glob = (cells.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
            .crossJoin(F.broadcast(
                cells.agg(F.sum("c").cast("long").alias("ta")))))
    wb = Window.partitionBy("g").orderBy("b") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wg = Window.partitionBy().orderBy("b") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_g = (dense.withColumn("cum", F.sum("c").over(wb))
             .join(F.broadcast(gtot), "g")
             .select("g", "b",
                     F.expr("(cum * 1000000) DIV tg").alias("cg")))
    cum_all = (glob.withColumn("cum", F.sum("cb").over(wg))
               .select("b", F.expr("(cum * 1000000) DIV ta")
                       .alias("ca")))
    j = cum_g.join(F.broadcast(cum_all), "b")
    return (j.groupBy(F.col("g").alias(group_col))
            .agg(F.count(F.lit(1)).cast("long").alias("n_bins"),
                 F.sum(F.abs(F.col("cg") - F.col("ca")))
                 .cast("long").alias("emd_ppm_bins"))
            .join(F.broadcast(gtot.select(
                F.col("g").alias(group_col),
                F.col("tg").alias("n_rows"))), group_col)
            .select(group_col, "n_rows", "n_bins", "emd_ppm_bins"))


def pareto_front(df: DataFrame, id_col: str, max_col: str,
                 min_col: str) -> DataFrame:
    """2-D skyline: rows not dominated by any other row, where a
    dominator has `max_col` >= and `min_col` <= with at least one
    strict inequality (the classic quality-vs-cost frontier — e.g.
    highest vocabulary richness at the lowest length budget).

    Single-sort plan (no self-join): sort distinct (q, c) points by
    (q DESC, c ASC); a point is on the front iff the running min of
    cost over STRICTLY PRECEDING points exceeds its cost. Preceding
    points have q' > q, or q' == q with c' < c (sort order over
    distinct points), so `min_prev <= c` captures exactly the
    dominance predicate — the naive NOT EXISTS quadratic check is
    the oracle twin, making the result a losslessness proof.

    Ties on the exact same (q, c) point: mutually non-dominating, so
    every id at a frontier point is returned. Scale shape: dominance
    runs over the DISTINCT point set (collapsed first); ids join
    back by equi-join only for frontier points.
    """
    pts = (df.select(F.col(id_col),
                     F.col(max_col).cast("long").alias("q"),
                     F.col(min_col).cast("long").alias("c")))
    dpts = pts.select("q", "c").distinct()
    w = (Window.orderBy(F.col("q").desc(), F.col("c").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    front = (dpts.withColumn("_mp", F.min("c").over(w))
             .where(F.col("_mp").isNull() | (F.col("_mp") > F.col("c")))
             .select("q", "c"))
    return (pts.join(front, ["q", "c"])
            .select(F.col(id_col), F.col("q").alias(max_col),
                    F.col("c").alias(min_col)))


def vocab_coverage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Good-Turing unseen-mass and Chao1 richness estimates — the
    corpus-planning numbers ("how much vocabulary is this corpus
    still missing?") that decide whether more crawling will pay.

    From the frequency-of-frequencies table alone: unseen probability
    mass ~= f1/N (Good-Turing), total richness ~= S_obs + f1^2/(2*f2)
    (Chao1) — all integer (ppm / DIV), one explode + two aggregates;
    the frequency table collapse means doc bodies never shuffle
    twice. f2=0 degenerates via greatest(2*f2, 1).
    """
    from logging_spark.functions import text as _T
    tok = df.select(F.explode(_T.tokens(text_col)).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long")
                                .alias("r"))
    return (freq.agg(
        F.sum("r").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum((F.col("r") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("r") == 2).cast("long")).cast("long").alias("f2"))
        .select("n_tokens", "s_obs", "f1", "f2",
                F.expr("(f1 * 1000000) DIV n_tokens").cast("long")
                .alias("unseen_mass_ppm"),
                F.expr("s_obs + (f1 * f1) DIV greatest(2 * f2, 1L)")
                .cast("long").alias("chao1")))
