"""Python UDTF surface: lateral key=value expansion of a log line.

The reference's parser emits one structured record per line
(pkg/service/service.go:118-150); the UDTF form is the LATERAL verb a
SQL user reaches for when one input row legitimately yields a
variable number of output rows and the expansion logic is easier in
Python than in a forest of regexp_extract calls.

This is deliberately the repo's ONE row-at-a-time Python surface:
registered as API coverage and value-checked against a DuckDB oracle,
but kept off the hot path (the production parser is
functions/parse.py's Arrow/pandas-UDF and pure-expression twins —
north_star mandates no per-row Python in the pipeline). At scale,
prefer the expression twin: explode(filter(split(text,' '), t -> t
like '%=%')) gives the same rows with whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key string, val string")
class KvPairs:
    """One row per `key=value` token of the input line; tokens are
    whitespace-split, the first '=' binds (a value may contain '=')."""

    def eval(self, text: str):  # noqa: D401
        if not text:
            return
        for tok in text.split():
            i = tok.find("=")
            if i > 0:
                yield (tok[:i], tok[i + 1:])


def register(spark) -> None:
    spark.udtf.register("kv_pairs", KvPairs)
