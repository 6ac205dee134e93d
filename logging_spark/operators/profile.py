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

from pyspark.sql import DataFrame
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
