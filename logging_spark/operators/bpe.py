"""BPE merge-candidate counting: adjacent-token-pair frequencies.

The first step of byte-pair-encoding tokenizer training is a corpus
scan counting every adjacent symbol pair; the most frequent pair
becomes the next merge rule. At training-corpus scale that scan IS
the workload (each iteration re-counts), so the shape matters:

- pairs are built per row with one `zip_with` over two shifted
  slices of the SAME pre-projected token array — arrays enter the
  HOF as plain column children, so nothing is re-evaluated per
  element (the interpreted-HOF re-evaluation trap);
- counting is explode + groupBy: partial (map-side) aggregation
  collapses each partition's pair multiset before the shuffle, so
  the exchange carries one row per distinct pair per partition —
  at 100 TB this is the difference between shuffling tokens and
  shuffling a vocabulary;
- top-k is orderBy+limit, which Spark plans as
  TakeOrderedAndProject (per-partition heaps + driver merge of k
  rows), never a global sort.

Ties are broken by pair text ascending so the k-th boundary is
deterministic under any partitioning (and oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.functions import text as T


def pair_counts(df: DataFrame, text_col: str = "text",
                k: int | None = None) -> DataFrame:
    """(pair, n): adjacent-token-pair frequencies over the corpus,
    top-k by (n desc, pair asc) when `k` is given."""
    toks = df.select(T.tokens(text_col).alias("_toks")).where(
        F.size("_toks") >= 2)
    pair = F.zip_with(
        F.expr("slice(_toks, 1, size(_toks) - 1)"),
        F.expr("slice(_toks, 2, size(_toks) - 1)"),
        lambda a, b: F.concat(a, F.lit(" "), b))
    out = (toks.select(F.explode(pair).alias("pair"))
           .groupBy("pair").agg(F.count(F.lit(1)).alias("n")))
    if k is not None:
        out = out.orderBy(F.col("n").desc(), "pair").limit(k)
    return out


# joiner for merged symbols — must not occur inside a token (tokens
# are whitespace-split, \x1e is a control char)
MERGE_JOIN = "\x1e"


def _pair_counts_arr(symbols: DataFrame, col: str = "syms") -> DataFrame:
    """pair_counts over an existing symbol-array column."""
    pair = F.zip_with(
        F.expr(f"slice({col}, 1, size({col}) - 1)"),
        F.expr(f"slice({col}, 2, size({col}) - 1)"),
        lambda a, b: F.concat(a, F.lit(" "), b))
    return (symbols.where(F.size(col) >= 2)
            .select(F.explode(pair).alias("pair"))
            .groupBy("pair").agg(F.count(F.lit(1)).alias("n")))


def _apply_one_merge(syms: "F.Column", left: str, right: str) -> "F.Column":
    """Greedy left-to-right non-overlapping merge of (left, right) in
    a symbol array, as one aggregate() fold: the accumulator is the
    rebuilt array; when its tail is `left` and the next symbol is
    `right`, the tail is replaced by the joined symbol (so an already-
    merged tail never re-merges — exact BPE application order)."""
    joined = F.lit(left + MERGE_JOIN + right)
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(joined)),
        ).otherwise(F.concat(acc, F.array(x))))


def learn_merges(df: DataFrame, n_merges: int,
                 text_col: str = "text") -> list[tuple[int, str, str, int]]:
    """Greedy BPE merge learning over the corpus: `n_merges` rounds of
    count-all-adjacent-pairs -> take the most frequent (ties by pair
    text ascending) -> rewrite every sequence with that merge applied.
    Returns [(rank, left, right, n_at_selection)].

    The iteration is inherently sequential (round r's counts depend on
    round r-1's rewrite — the reason this is a rows-only contract
    surface, like pagerank's loop before its unrolled oracle). Per
    round: one distributed pair count (map-side combined, shuffles a
    vocabulary not tokens), ONE driver row collected (the argmax —
    bounded like heavy_hitters' candidate recount), one narrow rewrite.
    The symbol frame is localCheckpoint-pinned between rounds so round
    r doesn't re-execute r-1 fold chains over the raw scan."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    syms = df.select(T.tokens(text_col).alias("syms"))
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        syms = syms.localCheckpoint(eager=False)
        top = (_pair_counts_arr(syms)
               .orderBy(F.col("n").desc(), "pair").limit(1).collect())
        if not top:
            break
        pair, n = top[0]["pair"], top[0]["n"]
        left, right = pair.split(" ", 1)
        merges.append((r + 1, left, right, int(n)))
        syms = syms.select(
            _apply_one_merge(F.col("syms"), left, right).alias("syms"))
    return merges


def apply_merges(df: DataFrame,
                 merges: list[tuple[int, str, str, int]],
                 text_col: str = "text",
                 out_col: str = "syms") -> DataFrame:
    """Tokenizer inference: apply a learned merge table in rank order
    to each document; adds `out_col` (array<string>). Pure expression
    chain — one narrow pass, no shuffle."""
    syms = T.tokens(text_col)
    for _, left, right, _ in sorted(merges):
        syms = _apply_one_merge(syms, left, right)
    return df.withColumn(out_col, syms)
