"""Generic Catalyst-expression helpers shared across operator modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body) -> Column:
    """Bind `value` ONCE and reference it freely inside `body`.

    Interpreted higher-order functions re-evaluate every expression in
    a lambda BODY per element, so a lambda that references a captured
    expression (a regex split, an n-gram build) re-computes it O(array
    length) times per row — the repo's measured 15×-300× per-row
    blowups all reduce to this. Lambda VARIABLES, by contrast, are
    evaluated once as HOF children. `let` turns any expression into a
    lambda variable: wrap it in a one-element array, transform over
    it, take element 0. Zero-cost scaffolding (one array of one
    pointer per row) — the Spark-expression analog of a local binding.
    """
    return F.transform(F.array(value), body).getItem(0)
