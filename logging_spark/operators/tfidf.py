"""TF-IDF keyword extraction: top-k terms per document.

Standard corpus-statistics keyword scoring (Salton/Sparck-Jones TF-IDF,
public methodology) used in training-data pipelines for topic tagging,
near-duplicate triage, and per-domain vocabulary audits. Like
operators/importance.py, the score is kept integer-exact so rankings
reproduce bit-for-bit on any engine and the DuckDB oracle value-matches:

  tf(d, t)   = occurrences of term t in doc d (whitespace tokens)
  df(t)      = number of (doc, term) groups containing t
               (i.e. docs where t appears at least once)
  idf_fp(t)  = (n_docs * SCALE) div df(t)      -- fixed-point LINEAR idf
  score      = tf * idf_fp

(The textbook log-idf is a one-line swap; linear idf keeps the per-term
ranking monotone in n_docs/df while staying integer-exact, the same
auditability trade made in operators/importance.py.)

Scale shape (100 TB corpus): term text is tiny relative to documents —
the doc body never shuffles, and it is SCANNED ONCE: df(t) is an
unbounded count window over the (doc_id, term, tf) frame rather than a
separate aggregate joined back, which would duplicate the whole
explode+count subtree (Spark recomputes shared lazy frames). Wide deps
are (1) the (doc_id, term) count shuffle, (2) the window repartition
on term, (3) the per-doc top-k window keyed on the uniform doc id.
n_docs rides a 1-row broadcast cross join fed by a column-pruned
count-only scan (parquet footers, no data pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logging_spark.functions.text import tokens

SCALE = 1_000_000


def term_frequencies(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, term, tf) per distinct term per document."""
    return (df.select(F.col(id_col),
                      F.explode(tokens(text_col)).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf")))


def tfidf_topk(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 5) -> DataFrame:
    """(id, term, tf, df, score): the k highest-TF-IDF terms per
    document, ties broken by term text ascending so the result is
    total-ordered. Documents with no tokens contribute no rows."""
    tf = term_frequencies(df, id_col=id_col, text_col=text_col)
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (tf.withColumn("df", F.count(F.lit(1)).over(
                  Window.partitionBy("term")).cast("long"))
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score", F.expr(
                  f"tf * ((n_docs * {SCALE}L) div df)").cast("long")))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "term")
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select(id_col, "term", F.col("tf").cast("long").alias("tf"),
                    F.col("df").cast("long").alias("df"), "score"))
