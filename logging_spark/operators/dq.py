"""Declarative data-quality expectations + order-insensitive table
fingerprints.

A pipeline that commits per-sink tables (plans/job.py) needs an audit
surface: assert schema-level invariants on every snapshot and produce
a cheap content fingerprint that downstream consumers can compare
across runs without re-reading the data.

`dq_checks` evaluates a declarative check set and returns ONE ROW PER
CHECK (check_name, n_checked, n_violations, passed):

- all row-local checks (not_null / range / accepted values) fold into
  a SINGLE aggregate pass over the table — adding a check adds one
  conditional-sum expression, never a scan;
- uniqueness is a groupBy on the key with sum(count-1) — one shuffle
  of the key columns only;
- foreign keys are a left-anti join against the (column-pruned)
  dimension key — broadcast when the dim is small.

`table_fingerprint` is a commutative checksum: bit_xor over 60-bit
md5 row hashes (+ row count). XOR is order- and partitioning-
insensitive, never overflows, and streams through a map-side partial
aggregate — at 100 TB the exchange carries one long per partition per
group. The same construction runs in DuckDB (hash60_sql + bit_xor),
so fingerprints are engine-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logging_spark.operators.sample import hash60

_SEP = chr(31)


def _finish(df: DataFrame) -> DataFrame:
    return df.select(
        "check_name",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.when(F.col("n_violations") == 0, F.lit(1)).otherwise(F.lit(0))
         .cast("int").alias("passed"))


def dq_checks(
    df: DataFrame,
    not_null: Sequence[str] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, Sequence[str]] | None = None,
    unique: Sequence[Sequence[str]] = (),
    foreign_keys: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate expectations; one output row per check.

    ``ranges`` bounds are inclusive; NULLs never violate a range or
    accepted-values check (declare ``not_null`` separately so each
    failure mode is its own row). ``foreign_keys`` entries are
    (fk_col, dim_df, pk_col); NULL fks are skipped (SQL semantics).
    """
    parts: list[DataFrame] = []

    # every row-local check is one conditional sum in a single pass;
    # coalesce each sum to 0 so an EMPTY input (sum -> NULL) reports
    # 0 violations / passed=1 instead of spuriously failing every check
    viols: list[Column] = []
    names: list[str] = []
    for c in not_null:
        names.append(f"not_null:{c}")
        viols.append(F.coalesce(F.sum(
            F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)))
    for c, (lo, hi) in (ranges or {}).items():
        names.append(f"range:{c}")
        viols.append(F.coalesce(F.sum(
            F.when(F.col(c).isNotNull()
                   & ~F.col(c).between(lo, hi), 1).otherwise(0)), F.lit(0)))
    for c, vals in (accepted or {}).items():
        names.append(f"accepted:{c}")
        viols.append(F.coalesce(F.sum(
            F.when(F.col(c).isNotNull()
                   & ~F.col(c).isin(*vals), 1).otherwise(0)), F.lit(0)))
    if names:
        base = df.agg(F.count(F.lit(1)).alias("_n"),
                      *[v.alias(f"_v{i}") for i, v in enumerate(viols)])
        stack = ", ".join(f"'{n}', _v{i}" for i, n in enumerate(names))
        parts.append(base.selectExpr(
            "_n",
            f"stack({len(names)}, {stack}) AS (check_name, n_violations)"
        ).select("check_name", F.col("_n").alias("n_checked"),
                 "n_violations"))

    for cols in unique:
        name = "unique:" + ",".join(cols)
        per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
        parts.append(per_key.agg(
            F.lit(name).alias("check_name"),
            F.coalesce(F.sum("_c"), F.lit(0)).alias("n_checked"),
            F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias("n_violations")))

    for fk, dim, pk in foreign_keys:
        # ONE fact scan: left join against the dimension KEY (a PK,
        # unique by contract — duplicates would both inflate counts
        # AND mean the dim fails its own unique check), then count
        # matches and misses in the same aggregate
        name = f"fk:{fk}->{pk}"
        fks = df.select(fk).where(F.col(fk).isNotNull())
        j = fks.join(dim.select(F.col(pk).alias("_pk")),
                     F.col(fk) == F.col("_pk"), "left")
        parts.append(j.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_checked"),
            F.coalesce(F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)),
                       F.lit(0)).alias("n_violations")))

    if not parts:
        raise ValueError("dq_checks: no checks declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _finish(out)


def table_fingerprint(
    df: DataFrame,
    cols: Sequence[Column | str],
    group_by: Sequence[str] = (),
    seed: str = "fp",
) -> DataFrame:
    """Commutative content checksum: (group cols?, fingerprint, n_rows).

    ``cols`` are the canonicalized row rendering — pass integer-exact
    expressions (cents, micros) rather than raw doubles so the string
    form is engine-portable. Identical multisets of rows produce the
    same fingerprint under any ordering or partitioning; XOR does hide
    rows duplicated an even number of times, which is why n_rows rides
    along.
    """
    rendered = [F.coalesce(
        (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols]
    h = hash60(F.concat_ws(_SEP, *rendered), seed)
    hashed = df.select(*group_by, h.alias("_h"))
    aggs = [F.expr("bit_xor(_h)").alias("fingerprint"),
            F.count(F.lit(1)).alias("n_rows")]
    if group_by:
        return hashed.groupBy(*group_by).agg(*aggs)
    return hashed.agg(*aggs)


def fk_cardinality(child: DataFrame, parent: DataFrame,
                   child_key: str, parent_key: str) -> DataFrame:
    """Join-cardinality audit for a foreign key: how many child rows
    does each parent key actually match? Returns (bucket, n):
    parent-side multiplicity buckets '0' / '1' / '2-10' / '>10'
    (n = parent keys in that bucket) plus one 'orphan_child_rows'
    row (child rows whose key has NO parent — the referential-
    integrity violation count).

    Two aggregates and one equi-join, all on the key columns; child
    row WIDTH never shuffles (only the key + count). The '0' bucket
    is the anti-join census, the '>10' bucket is the fan-out-blowup
    early warning for downstream joins."""
    cnt = (child.groupBy(F.col(child_key).alias("_k"))
           .agg(F.count(F.lit(1)).alias("_n")))
    pk = parent.select(F.col(parent_key).alias("_k"))
    per = (pk.join(cnt, "_k", "left")
           .select(F.coalesce("_n", F.lit(0)).alias("_n")))
    bucket = (F.when(F.col("_n") == 0, "0")
              .when(F.col("_n") == 1, "1")
              .when(F.col("_n") <= 10, "2-10")
              .otherwise(">10"))
    parents = (per.groupBy(bucket.alias("bucket"))
               .agg(F.count(F.lit(1)).alias("n")))
    orphans = (cnt.join(pk, "_k", "left_anti")
               .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long")
                    .alias("n"))
               .select(F.lit("orphan_child_rows").alias("bucket"), "n"))
    return parents.unionByName(orphans)


def cohen_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) between two integer
    label columns, integer-exact: one grouped count over the (a, b)
    confusion cells (the ONLY shuffle — at most |labels|^2 groups,
    map-side combined), then driver-free marginal algebra on the tiny
    cell table. Output is a single row

        (n, n_agree, pe_num, kappa_x1e6)

    with kappa_x1e6 = ((n*n_agree - pe_num) * 1e6) DIV (n*n - pe_num)
    and pe_num = sum_k row_k * col_k — the exact integer numerator /
    denominator split, portable because both engines truncate BIGINT
    division toward zero. Overflow-safe while n^2 * 1e6 < 2^63
    (n up to ~3e6 labeled rows; past that, consume the exact integer
    components and divide downstream)."""
    cells = (df.groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
             .agg(F.count(F.lit(1)).alias("_n")))
    rows = cells.groupBy("_a").agg(F.sum("_n").alias("_ra"))
    cols = cells.groupBy("_b").agg(F.sum("_n").alias("_cb"))
    pe = (rows.join(cols, rows["_a"] == cols["_b"])
          .agg(F.coalesce(F.sum(F.col("_ra") * F.col("_cb")), F.lit(0))
               .cast("long").alias("pe_num")))
    tot = cells.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n"))),
                   F.lit(0)).cast("long").alias("n_agree"))
    return (tot.crossJoin(pe)
            .select("n", "n_agree", "pe_num",
                    F.expr("CASE WHEN n * n - pe_num = 0 THEN 1000000 "
                           "ELSE ((n * n_agree - pe_num) * 1000000) "
                           "DIV (n * n - pe_num) END").alias("kappa_x1e6")))


def wilson_lower_bound(df: DataFrame, group_cols: Sequence[str],
                       success_col: str, z: float = 1.96) -> DataFrame:
    """Rank groups by a success RATE with uncertainty: the Wilson
    score interval's lower bound — the standard fix for "3/3 keeps
    outranks 9500/10000" naive-rate ranking (small-n groups get
    pulled toward zero).

    One grouped aggregate (k successes, n trials), then pure
    DETERMINISTIC-DOUBLE arithmetic: all inputs are exact integers
    cast to double, every +,-,*,/,sqrt is IEEE correctly-rounded and
    bit-identical in Spark and DuckDB, and the single floor(x*1e6) at
    the end lands the same BIGINT in both engines (same pattern as the
    dyadic percentile interpolation — see contract.py header). The
    oracle must spell the formula with the IDENTICAL parenthesization.

    Output: (group..., n, k, wilson_lb_x1e6)."""
    gcols = [F.col(c) for c in group_cols]
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col(success_col).cast("long")), F.lit(0))
        .cast("long").alias("k"))
    z2 = z * z
    expr = (
        f"CAST(floor(1000000 * ("
        f"(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + {z2} / "
        f"(2.0 * CAST(n AS DOUBLE))"
        f" - {z} * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * "
        f"(1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) + {z2} / "
        f"(4.0 * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE))) "
        f"/ (1.0 + {z2} / CAST(n AS DOUBLE)))) AS BIGINT)")
    return agg.select(*[F.col(c) for c in group_cols], "n", "k",
                      F.expr(expr).alias("wilson_lb_x1e6"))


def fleiss_kappa(df: DataFrame, subject_col: str,
                 category_col: str) -> DataFrame:
    """Multi-rater agreement (Fleiss 1971) over LONG-form ratings —
    one row per (subject, rater-assignment); the rater identity is
    irrelevant to the statistic, only the per-subject category counts
    n_ij matter. Integer-exact throughout (the Cohen's-kappa sibling
    for >2 raters).

    Dataflow: one grouped count to the (subject, category) cells —
    the only data-sized shuffle, map-side combined — then two tiny
    aggregates over the cell table (per-subject sum of n_ij^2, and
    per-category marginals), combined by broadcast. With
      A = sum_ij n_ij^2,  C = sum_j (sum_i n_ij)^2,  N subjects,
      R raters: kappa = ((A-NR)*NR - C*(R-1)) / ((R-1)*((NR)^2 - C)).
    All BIGINT: exact while N^2 * R^3 * 1e6 < 2^63 (~5e5 subjects at
    R=3); past that, compute the two ratios in ppm first (keyness
    rescale). Fleiss assumes a CONSTANT rater count per subject —
    violations are surfaced as r_min != r_max in the output row (the
    statistic row is still emitted, using R = r_max), never silently
    averaged away.

    Output: n_subjects, n_raters(=r_max), r_min, n_categories,
    p_bar_x1e6, p_e_x1e6, kappa_x1e6.
    """
    cells = (df.groupBy(F.col(subject_col).alias("_s"),
                        F.col(category_col).alias("_c"))
             .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    # pin: cells feeds three aggregates below; without it the raw
    # scan+count subtree runs three times in one plan
    cells = cells.localCheckpoint()
    per_subj = cells.groupBy("_s").agg(
        F.sum(F.col("_n") * F.col("_n")).cast("long").alias("_sq"),
        F.sum("_n").cast("long").alias("_r"))
    subj = per_subj.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("_sq").cast("long").alias("a"),
        F.min("_r").cast("long").alias("r_min"),
        F.max("_r").cast("long").alias("n_raters"))
    cat = (cells.groupBy("_c")
           .agg(F.sum("_n").cast("long").alias("_cj"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_categories"),
                F.sum(F.col("_cj") * F.col("_cj")).cast("long")
                .alias("c")))
    nr = "(n_subjects * n_raters)"
    den_pb = f"({nr} * (n_raters - 1))"
    return (subj.crossJoin(F.broadcast(cat))
            .select("n_subjects", "n_raters", "r_min", "n_categories",
                    F.expr(f"((a - {nr}) * 1000000) DIV {den_pb}")
                    .cast("long").alias("p_bar_x1e6"),
                    F.expr(f"(c * 1000000) DIV ({nr} * {nr})")
                    .cast("long").alias("p_e_x1e6"),
                    F.expr(
                        f"CASE WHEN (n_raters - 1) * ({nr} * {nr} - c)"
                        f" = 0 THEN 1000000 ELSE "
                        f"(((a - {nr}) * {nr} - c * (n_raters - 1))"
                        f" * 1000000) DIV "
                        f"((n_raters - 1) * ({nr} * {nr} - c)) END")
                    .cast("long").alias("kappa_x1e6")))


# floor(log10(1 + 1/d) * 1e6), d = 1..9 — exact integer constants so
# both engines compare against identical expectations (no runtime log)
BENFORD_PPM = [301029, 176091, 124938, 96910, 79181,
               66946, 57991, 51152, 45757]


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive integer
    column vs Benford's law — the classic fabricated-data / unit-mixup
    tripwire for financial-style columns. One grouped count to <=9
    cells (the only shuffle), shares in ppm, expectations as baked
    integer constants (log10 never runs at query time, so the audit is
    engine-portable and exact). Rows with value <= 0 are excluded
    (Benford is defined on positive magnitudes).

    Output per digit: n, share_ppm, expected_ppm,
    dev_ppm = share - expected (signed).
    """
    digits = df.where(F.col(value_col) > 0).select(
        F.expr(f"CAST(substring(CAST({value_col} AS STRING), 1, 1) "
               "AS BIGINT)").alias("digit"))
    cnt = (digits.groupBy("digit")
           .agg(F.count(F.lit(1)).cast("long").alias("n"))
           .localCheckpoint())  # feeds totals AND shares: one pass
    tot = cnt.agg(F.sum("n").cast("long").alias("t"))
    exp_arr = "array(" + ", ".join(f"{v}L" for v in BENFORD_PPM) + ")"
    return (cnt.crossJoin(F.broadcast(tot))
            .select("digit", "n",
                    F.expr("(n * 1000000) DIV t").cast("long")
                    .alias("share_ppm"),
                    F.expr(f"element_at({exp_arr}, CAST(digit AS INT))")
                    .cast("long").alias("expected_ppm"))
            .withColumn("dev_ppm",
                        (F.col("share_ppm") - F.col("expected_ppm"))
                        .cast("long")))


def freshness(df: DataFrame, ts_col: str, group_cols: list[str],
              as_of: str) -> DataFrame:
    """Data-freshness audit: per group, rows seen and seconds of
    staleness at a FIXED instant ``as_of`` (ISO-8601, interpreted
    UTC). The reference instant is a parameter, never wall-clock
    now() — reproducible re-runs and engine-portable oracles both
    forbid a hidden clock read. One grouped agg; negative lag means
    data from the future of as_of (its own data-quality smell, so it
    is NOT clamped)."""
    from datetime import datetime, timezone
    dt = datetime.fromisoformat(as_of).replace(tzinfo=timezone.utc)
    as_of_us = int(dt.timestamp()) * 1_000_000
    us = F.expr(f"unix_micros(CAST({ts_col} AS timestamp))")
    return (df.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.max(us).cast("long").alias("max_us"))
            .select(*group_cols, "n_rows", "max_us",
                    F.expr(f"({as_of_us} - max_us) DIV 1000000")
                    .cast("long").alias("staleness_s")))


def simpson_flip(df: DataFrame, group_col: str, x_col: str,
                 y_col: str) -> DataFrame:
    """Simpson's-paradox audit: does the x-y association reverse
    sign inside every (or any) subgroup vs the pooled data? The
    classic aggregation hazard — a pooled trend that every stratum
    contradicts — caught BEFORE someone ships the pooled number.

    Association is the exact integer covariance numerator
    cov = n*sum(xy) - sum(x)*sum(y) (same sign as the correlation,
    no division). One grouped aggregate per stratum; the pooled
    numerator recomputes from the SAME per-group sums (no second
    scan). Output per group: n, cov_num, pooled_cov_num, and
    flip = 1 iff both are nonzero with opposite signs.
    """
    per = (df.select(F.col(group_col).alias("g"),
                     F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
           .groupBy("g")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy")))
    per = per.localCheckpoint()  # feeds the pooled agg + the output
    pooled = per.agg(
        (F.sum("n") * F.sum("sxy") - F.sum("sx") * F.sum("sy"))
        .cast("long").alias("pooled_cov_num"))
    return (per.crossJoin(F.broadcast(pooled))
            .select(F.col("g").alias(group_col), "n",
                    F.expr("n * sxy - sx * sy").cast("long")
                    .alias("cov_num"), "pooled_cov_num")
            .withColumn("flip", F.expr(
                "CAST(sign(cov_num) * sign(pooled_cov_num) < 0 "
                "AS INT)")))
