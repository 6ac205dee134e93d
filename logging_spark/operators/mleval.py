"""Model-evaluation statistics as exact-integer dataflow.

A training-data pipeline that gates documents with a model score needs
to AUDIT that model at corpus scale: ranking power (AUC), calibration
(reliability bins / ECE), accuracy of the probabilities (Brier), and
distribution drift between two snapshots of the score. Every statistic
here is computed from map-side-combined integer aggregates — the same
query text is the 100 TB plan — and each has a DuckDB oracle twin in
the contract (integer fixed-point, no engine-dependent float paths).

Reference parity: the reference pipeline has no model-eval surface
(it is a log router, pkg/core/*.go); this family is part of the
beyond-reference training-data brief.

Scale notes
-----------
- ``auc_exact`` groups by (group, score) FIRST, so the only wide
  stages carry one row per distinct score value per group. Quantize
  scores (e.g. to ppm) upstream so that cardinality is bounded —
  with ppm scores the per-group state is <= 1e6+1 rows no matter how
  many raw rows went in. The rank walk is a cumulative window over
  those collapsed rows, never the raw data.
- ``calibration_bins`` / ``brier_score`` / ``drift_index`` are single
  grouped aggregates over codegen'd expressions (no UDF, no window).
- Overflow: Brier's per-row squared error is <= 1e12, so a BIGINT sum
  is exact to ~9.2e6 rows per group; pass ``exact_decimal=True`` to
  carry the sum as DECIMAL(38,0) (exact to ~1e26 rows) when a group
  may exceed that. AUC's pair count P*N overflows BIGINT only past
  ~3e9 positives x negatives in one group — past that, stratify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def auc_exact(df: DataFrame, score_col: str, label_col: str,
              by: list[str] | None = None) -> DataFrame:
    """Exact tie-aware ROC AUC per group, as ``auc_x1e6`` (BIGINT).

    Mann-Whitney pair counting on score-collapsed rows: for each
    distinct score s (ascending) with ``p_s`` positives and ``q_s``
    negatives, concordant pairs gain ``p_s * (negatives below s)`` and
    tied pairs gain ``p_s * q_s``; AUC = (conc + tied/2) / (P*N),
    emitted as ``floor((2*conc + tied) * 1e6 / (2*P*N))`` so the
    arithmetic is pure BIGINT (identical in DuckDB with ``//``).

    ``label_col`` must be 0/1 (cast upstream). Groups with P==0 or
    N==0 (AUC undefined) report ``auc_x1e6 = -1``.
    """
    by = list(by or [])
    s = F.col(score_col)
    lab = F.col(label_col).cast("long")
    per_score = (df.groupBy(*by, s.alias("_s"))
                 .agg(F.sum(lab).alias("_p"),
                      F.sum(F.lit(1) - lab).alias("_q")))
    w = (Window.partitionBy(*by) if by else Window.partitionBy()) \
        .orderBy("_s") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # cumulative negatives INCLUDING this score, minus own q = below
    walked = per_score.withColumn(
        "_cq", F.sum("_q").over(w) - F.col("_q"))
    agg = (walked.groupBy(*by)
           .agg(F.sum(F.col("_p") * F.col("_cq")).cast("long")
                .alias("concordant"),
                F.sum(F.col("_p") * F.col("_q")).cast("long")
                .alias("tied"),
                F.sum("_p").cast("long").alias("n_pos"),
                F.sum("_q").cast("long").alias("n_neg")))
    return agg.select(
        *by, "n_pos", "n_neg", "concordant", "tied",
        F.expr(f"CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1 "
               f"ELSE ((2 * concordant + tied) * {PPM}) "
               f"DIV (2 * n_pos * n_neg) END").cast("long")
        .alias("auc_x1e6"))


def calibration_bins(df: DataFrame, score_ppm_col: str, label_col: str,
                     n_bins: int = 10,
                     by: list[str] | None = None) -> DataFrame:
    """Reliability-diagram bins over a ppm-scaled score in [0, 1e6].

    One grouped aggregate: per bin, row count, positives, mean
    predicted confidence and empirical accuracy (both ppm, integer
    DIV) and the signed gap. ECE is one more aggregate over THIS
    output (see :func:`ece`) — never a second corpus pass.
    """
    by = list(by or [])
    score = F.col(score_ppm_col).cast("long")
    lab = F.col(label_col).cast("long")
    # integer floor division, not true division:
    binc = F.expr(f"least(CAST({n_bins - 1} AS BIGINT), "
                  f"(CAST({score_ppm_col} AS BIGINT) * {n_bins}) "
                  f"DIV {PPM})")
    out = (df.groupBy(*by, binc.alias("bin"))
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(lab).cast("long").alias("n_pos"),
                F.sum(score).cast("long").alias("_conf_sum")))
    return out.select(
        *by, "bin", "n", "n_pos",
        F.expr("_conf_sum DIV n").cast("long").alias("conf_ppm"),
        F.expr(f"(n_pos * {PPM}) DIV n").cast("long").alias("acc_ppm"),
        F.expr(f"(n_pos * {PPM}) DIV n - _conf_sum DIV n").cast("long")
        .alias("gap_ppm"))


def ece(bins: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Expected calibration error from :func:`calibration_bins` output:
    ``sum(n * |acc - conf|) DIV N`` as ``ece_x1e6``."""
    by = list(by or [])
    g = bins.groupBy(*by) if by else bins.groupBy()
    return (g.agg(F.sum("n").cast("long").alias("n_total"),
                  F.sum(F.col("n") * F.abs(F.col("gap_ppm")))
                  .cast("long").alias("_w"))
            .select(*by, "n_total",
                    F.expr("_w DIV n_total").cast("long")
                    .alias("ece_x1e6")))


def brier_score(df: DataFrame, score_ppm_col: str, label_col: str,
                by: list[str] | None = None,
                exact_decimal: bool = False) -> DataFrame:
    """Mean squared error of a ppm probability vs a 0/1 label, as
    ``brier_x1e6`` in [0, 1e6]. Per-row squared error is
    ``(score_ppm - label*1e6)^2 <= 1e12``; with ``exact_decimal`` the
    sum rides DECIMAL(38,0) so the statistic stays exact past the
    ~9.2e6-rows-per-group BIGINT bound."""
    by = list(by or [])
    err = (F.col(score_ppm_col).cast("long")
           - F.col(label_col).cast("long") * PPM)
    sq = err * err
    if exact_decimal:
        sq = sq.cast("decimal(38,0)")
    g = df.groupBy(*by) if by else df.groupBy()
    agg = g.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(sq).alias("_sse"))
    if exact_decimal:
        mean = F.expr(f"CAST(floor(_sse / (CAST(n AS DECIMAL(20,0)) "
                      f"* {PPM})) AS BIGINT)")
    else:
        mean = F.expr(f"_sse DIV (n * {PPM})").cast("long")
    return agg.select(*by, "n", mean.alias("brier_x1e6"))


def drift_index(old: DataFrame, new: DataFrame, bin_col: str) -> DataFrame:
    """Integer distribution-drift index between two snapshots of a
    binned value: per bin, shares in ppm on each side, then a
    chi-square-shaped penalty ``(new_ppm - old_ppm)^2 DIV
    max(old_ppm, 1)`` summed over bins (``drift_x1e6``; 0 = identical
    shares). Scale-free: both sides collapse to <=|bins| rows before
    the (broadcast) totals join, so the comparison costs two grouped
    counts no matter the snapshot size. Bins present on only one side
    count with the other side's share = 0.
    """
    oc = old.groupBy(F.col(bin_col).alias("bin")) \
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    nc = new.groupBy(F.col(bin_col).alias("bin")) \
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    # j (<=|bins| rows) feeds both the totals and the per-bin shares;
    # pin it or the two-snapshot scan subtree runs twice in one plan
    # (keyness precedent).
    j = (oc.join(nc, "bin", "full_outer")
         .select("bin",
                 F.coalesce("o", F.lit(0)).alias("o"),
                 F.coalesce("c", F.lit(0)).alias("c"))
         .localCheckpoint())
    tot = j.agg(F.sum("o").cast("long").alias("to"),
                F.sum("c").cast("long").alias("tc"))
    per = (j.crossJoin(F.broadcast(tot))
           .select("bin", "o", "c",
                   F.expr(f"(o * {PPM}) DIV to").alias("old_ppm"),
                   F.expr(f"(c * {PPM}) DIV tc").alias("new_ppm")))
    return (per.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.expr(
            "((new_ppm - old_ppm) * (new_ppm - old_ppm)) "
            "DIV greatest(old_ppm, 1L)")).cast("long")
        .alias("drift_x1e6")))


def isotonic_fit(bins: DataFrame, bin_col: str, w_col: str,
                 s_col: str) -> DataFrame:
    """Isotonic (monotone nondecreasing) regression over an ordered,
    COLLAPSED bin table — the calibration-map fitter that turns raw
    reliability bins into a monotone score->probability map.

    Instead of PAVA's stack recursion (a poor fit for SQL engines),
    this uses the exact minimax characterization

        fit_i = max_{j <= i} min_{k >= i} avg(s over bins j..k)

    evaluated in x1e6 fixed point. Floor commutes with min and max,
    so flooring each interval average FIRST yields exactly
    floor(true_fit * 1e6) — bit-identical across engines, no
    iteration. Cost is the triangular interval join over the bin
    table: O(n_bins^3) tuples, which is the whole point of running
    it on collapsed bins (n_bins <= ~100), never on raw rows.

    Output: the input columns + fit_x1e6, one row per bin.
    """
    b = bins.select(F.col(bin_col).cast("long").alias("i"),
                    F.col(w_col).cast("long").alias("w"),
                    F.col(s_col).cast("long").alias("s"))
    wc = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    cum = b.select(
        "i", "w", "s",
        F.sum("w").over(wc).alias("cw"),
        F.sum("s").over(wc).alias("cs")).localCheckpoint()
    j = cum.select(F.col("i").alias("ji"),
                   (F.col("cw") - F.col("w")).alias("cwp"),
                   (F.col("cs") - F.col("s")).alias("csp"))
    k = cum.select(F.col("i").alias("ki"), F.col("cw").alias("cwk"),
                   F.col("cs").alias("csk"))
    ivals = (j.join(k, F.col("ji") <= F.col("ki"))
             .select("ji", "ki",
                     F.expr("((csk - csp) * 1000000) DIV (cwk - cwp)")
                     .alias("a")))
    pts = (ivals.join(cum.select(F.col("i")),
                      (F.col("ji") <= F.col("i"))
                      & (F.col("i") <= F.col("ki")))
           .groupBy("i", "ji").agg(F.min("a").alias("_mn"))
           .groupBy("i").agg(F.max("_mn").cast("long")
                             .alias("fit_x1e6")))
    return (bins.join(pts, F.col(bin_col).cast("long") == F.col("i"))
            .drop("i"))


def pr_curve(df: DataFrame, score_ppm_col: str,
             label_col: str) -> DataFrame:
    """Exact precision-recall curve: one point per DISTINCT score
    threshold (predict positive iff score >= t), from one descending
    prefix sum over the score-collapsed table — the same
    collapse-first shape as auc_exact, so a billion rows cost one
    groupBy plus a window over distinct scores.

    Integer outputs per threshold: tp, fp, fn, precision_ppm,
    recall_ppm, f1_ppm (= 2*tp*1e6 DIV (2*tp+fp+fn) — one DIV,
    exact).
    """
    s = (df.select(F.col(score_ppm_col).cast("long").alias("t"),
                   F.col(label_col).cast("long").alias("y"))
         .groupBy("t")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("y").cast("long").alias("pos")))
    s = s.localCheckpoint()  # feeds the window + the total
    tot = s.agg(F.sum("pos").alias("p_all"))
    w = (Window.orderBy(F.col("t").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (s.crossJoin(F.broadcast(tot))
           .select("t", "p_all",
                   F.sum("pos").over(w).alias("tp"),
                   (F.sum("n").over(w) - F.sum("pos").over(w))
                   .alias("fp")))
    return cum.select(
        F.col("t").alias("threshold_ppm"), "tp", "fp",
        (F.col("p_all") - F.col("tp")).alias("fn"),
        F.expr("(tp * 1000000) DIV (tp + fp)").cast("long")
        .alias("precision_ppm"),
        F.expr("(tp * 1000000) DIV greatest(p_all, 1L)").cast("long")
        .alias("recall_ppm"),
        F.expr("(2 * tp * 1000000) DIV greatest(2 * tp + fp + "
               "(p_all - tp), 1L)").cast("long").alias("f1_ppm"))


def conformal_threshold(df: DataFrame, score_col: str,
                        by: list[str] | None = None,
                        alpha_ppm: int = 100_000) -> DataFrame:
    """Split-conformal prediction threshold (Vovk et al.; Angelopoulos
    & Bates 2021 tutorial): the k-th smallest calibration
    nonconformity score with k = ceil((n+1) * (1 - alpha)) — the
    value q_hat such that predicting {score <= q_hat} covers a fresh
    point with probability >= 1 - alpha, distribution-free.

    k is exact integer arithmetic (ceil via (x + 1e6 - 1) DIV 1e6 on
    ppm), and the order statistic comes from the repo's collapsed-
    value prefix-sum pattern: scores collapse to (value, count) per
    group, a cumulative count window picks the first value whose
    prefix reaches k — distinct values, not rows, cross the window.
    Output: by..., n_cal, k, q_hat (NULL when k > n: alpha too small
    for this calibration size — caller must grow the split).
    """
    by = list(by or [])
    per = (df.groupBy(*by, F.col(score_col).cast("long").alias("_s"))
           .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    w = (Window.partitionBy(*by) if by else Window.partitionBy()
         ).orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(*by, "_s", F.sum("_c").over(w).alias("_cum"))
    n = per.groupBy(*by).agg(F.sum("_c").cast("long").alias("n_cal"))
    kexpr = (f"((n_cal + 1) * CAST({PPM - alpha_ppm} AS BIGINT) "
             f"+ {PPM - 1}) DIV {PPM}")
    j = cum.join(n, by) if by else cum.crossJoin(F.broadcast(n))
    got = (j.selectExpr(*by, "_s", "_cum", "n_cal",
                        f"{kexpr} AS k")
           .where("_cum >= k")
           .groupBy(*by, "n_cal", "k")
           .agg(F.min("_s").cast("long").alias("q_hat")))
    # groups where k > n produce no row above; re-attach with NULL
    # (the no-by path needs an always-true LEFT join: a crossJoin
    # against an EMPTY got would drop the base row entirely)
    base = n.selectExpr(*by, "n_cal", f"{kexpr} AS k")
    if by:
        return base.join(got.select(*by, "q_hat"), by, "left")
    return base.join(F.broadcast(got.select("q_hat")),
                     F.lit(True), "left")


def conformal_audit(cal: DataFrame, test: DataFrame, score_col: str,
                    by: list[str] | None = None,
                    alpha_ppm: int = 100_000) -> DataFrame:
    """Empirical coverage of the split-conformal threshold on a
    held-out split: share of test scores <= q_hat, vs the 1 - alpha
    target. Both splits aggregate independently; the threshold table
    is one row per group and broadcasts into the test-side count —
    no test-row shuffle beyond its own groupBy."""
    by = list(by or [])
    thr = conformal_threshold(cal, score_col, by, alpha_ppm)
    t = test.select(*by, F.col(score_col).cast("long").alias("_s"))
    joined = (t.join(F.broadcast(thr), by) if by
              else t.crossJoin(F.broadcast(thr)))
    return (joined.groupBy(*by, "n_cal", "k", "q_hat")
            .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
                 F.sum(F.expr("CAST(_s <= q_hat AS BIGINT)"))
                 .cast("long").alias("n_covered"))
            .selectExpr(*by, "n_cal", "k", "q_hat", "n_test",
                        "(n_covered * 1000000) DIV n_test "
                        "AS coverage_ppm",
                        f"CAST({PPM - alpha_ppm} AS BIGINT) "
                        "AS target_ppm"))


def policy_replay(df: DataFrame, action_col: str, reward_col: str,
                  policy_col: str, n_actions: int,
                  by: list[str] | None = None) -> DataFrame:
    """Offline policy evaluation on logged interaction data (Li et al.
    2011 replay method): how would a DETERMINISTIC target policy have
    performed, using only rounds where the logged action happens to
    agree with it?

    Two estimators ride one aggregate, both exact integers:
    - replay_value_x100 = mean reward over matched rounds (unbiased
      when logging was uniform-random over ``n_actions`` arms);
    - ips_value_x100 = n_actions * sum(matched reward) / n — inverse
      propensity scoring under the same uniform-logging assumption
      (propensity 1/K per arm), which also counts the zero
      contribution of unmatched rounds.
    Output per group: n, n_matched, match_ppm, both values x100.
    NULL replay value when nothing matched.
    """
    by = list(by or [])
    m = F.expr(f"CAST({action_col} = {policy_col} AS BIGINT)")
    r = F.col(reward_col).cast("long")
    g = df.groupBy(*by) if by else df.groupBy()
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(m).cast("long").alias("n_matched"),
        F.sum(m * r).cast("long").alias("_mr"))
    return agg.selectExpr(
        *by, "n", "n_matched",
        "(n_matched * 1000000) DIV n AS match_ppm",
        "CASE WHEN n_matched > 0 THEN (_mr * 100) DIV n_matched "
        "ELSE CAST(NULL AS BIGINT) END AS replay_value_x100",
        f"({n_actions} * _mr * 100) DIV n AS ips_value_x100")
