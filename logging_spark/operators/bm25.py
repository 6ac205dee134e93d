"""BM25 retrieval scoring: rank corpus documents against a small set
of queries.

Standard Okapi BM25 (Robertson/Sparck-Jones, public methodology) — the
workhorse lexical ranker for retrieval-augmented training-data
curation: finding support passages for eval questions, mining
demonstration candidates for a prompt, or auditing what an embedding
retriever misses. Like operators/tfidf.py the score is kept
INTEGER-exact so rankings reproduce bit-for-bit on any engine and the
DuckDB oracle value-matches:

  tf(d,t)     occurrences of t in doc d (whitespace tokens)
  dl(d)       token count of d;  avgdl_x100 = (100 * total_tokens) DIV n_docs
  idf_fp(t)   = (n_docs * scale) DIV df(t)          -- linear idf, as tfidf.py
  core_x1000  = (100000 * tf * (k1_x10+10) * avgdl_x100)
                DIV (1000*tf*avgdl_x100 + k1_x10*(100-b_x100)*avgdl_x100
                     + 100*k1_x10*b_x100*dl)
  score(q,d)  = sum over distinct query terms of idf_fp * core_x1000

core_x1000 is the textbook tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
saturation term with k1 = k1_x10/10 and b = b_x100/100, scaled by
1000*avgdl_x100 in both numerator and denominator so all arithmetic is
BIGINT and the only division is a single integer DIV — identical in
Spark (`a DIV b`) and DuckDB (`a // b`) for the non-negative operands
here. Overflow budget: the numerator is 1e5 * tf * 22 * avgdl_x100;
with tf, dl <= 1e5 tokens and avgdl <= 1e5 (avgdl_x100 <= 1e7) it
peaks ~2.2e17 < 2^63. idf_fp * core_x1000 <= n_docs * scale * 2200:
shrink `scale` as n_docs grows past ~1e9 (documented, not silent).

Scale shape (100 TB corpus, handful of queries): the corpus is
tokenized ONCE into a (doc, term, tf) frame; df(t) and the per-(query,
doc) scores are computed only for the union of query terms — the
frame is semi-joined against the broadcast query-term table FIRST, so
the wide stages carry a few-terms sliver of the corpus. Document
bodies never shuffle. n_docs / total_tokens ride a 1-row broadcast.
The reference has no retrieval operator; this extends the engine for
the training-data brief (eval-support mining), same charter as
operators/tfidf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logging_spark.functions.text import tokens

SCALE = 1_000_000


def query_terms_df(spark: SparkSession,
                   queries: list[tuple[str, str]]) -> DataFrame:
    """(query_id, term) rows — distinct whitespace-lowered terms per
    query (BM25 sums each term once; repeated query terms collapse)."""
    rows = sorted({(qid, t.lower())
                   for qid, qtext in queries for t in qtext.split()})
    return F.broadcast(spark.createDataFrame(
        rows, "query_id string, term string"))


def bm25_scores(docs: DataFrame, queries: list[tuple[str, str]],
                id_col: str = "doc_id", text_col: str = "text",
                k1_x10: int = 12, b_x100: int = 75,
                scale: int = SCALE) -> DataFrame:
    """(query_id, doc_id, score) for every document sharing at least
    one term with the query. Integer-exact; see module docstring.
    Query terms are lowercased; corpus tokens are matched AS IS —
    lower the text upstream (functions/text.normalize) for
    case-insensitive retrieval.

    Plan shape: TWO corpus scans total. Scan 1 is a narrow agg for
    (n_docs, total_tokens). Scan 2 explodes tokens and immediately
    broadcast-joins the query-term table — non-query terms die
    PRE-shuffle, so the (query, term, doc) groupBy carries only the
    hit sliver, never the vocabulary. dl rides the exploded rows as
    a pre-projected column (never joined back — a full-corpus dl
    join was the first version's 4x-recompute mistake, measured
    8.7 s -> 1.3 s at sf0.1)."""
    spark = docs.sparkSession
    qt = query_terms_df(spark, queries)
    toks = (docs.select(F.col(id_col), tokens(text_col).alias("_toks"))
            .where(F.size("_toks") > 0))
    stats = (toks.select(F.size("_toks").alias("dl"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                  F.sum("dl").cast("long").alias("s_tokens"))
             .select("n_docs", F.expr("(100 * s_tokens) DIV n_docs")
                     .alias("avgdl_x100")))
    hits = (toks.select(F.col(id_col),
                        F.size("_toks").cast("long").alias("dl"),
                        F.explode("_toks").alias("term"))
            .join(qt, "term")
            .groupBy("query_id", "term", id_col, "dl")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    dfreq = hits.withColumn(
        "df", F.count(F.lit(1)).over(
            Window.partitionBy("query_id", "term")).cast("long"))
    scored = (dfreq.crossJoin(F.broadcast(stats))
              .withColumn("idf_fp", F.expr(f"(n_docs * {scale}L) DIV df"))
              .withColumn("core_x1000", F.expr(
                  f"(100000 * tf * {k1_x10 + 10} * avgdl_x100) DIV "
                  f"(1000 * tf * avgdl_x100 "
                  f"+ {k1_x10 * (100 - b_x100)} * avgdl_x100 "
                  f"+ {100 * k1_x10 * b_x100} * dl)")))
    return (scored.groupBy("query_id", id_col)
            .agg(F.sum(F.col("idf_fp") * F.col("core_x1000"))
                 .cast("long").alias("score")))


def bm25_topk(docs: DataFrame, queries: list[tuple[str, str]],
              k: int = 10, id_col: str = "doc_id",
              text_col: str = "text", k1_x10: int = 12,
              b_x100: int = 75, scale: int = SCALE) -> DataFrame:
    """(query_id, rank, doc_id, score): the k best documents per
    query, ties broken by doc id ascending (total order)."""
    s = bm25_scores(docs, queries, id_col=id_col, text_col=text_col,
                    k1_x10=k1_x10, b_x100=b_x100, scale=scale)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col))
    return (s.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("int").alias("rank"),
                    id_col, "score"))


def phrase_hits(df: DataFrame, phrase: str, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_occurrences): documents containing the exact token
    phrase, via a positional index — posexplode to (doc, pos, tok),
    FILTER to the phrase's terms before anything wide (the BM25
    query-term lesson: the index the join sees is |phrase| postings
    lists, not the corpus), then chain equi-joins on
    (doc, pos + offset). Substring LIKE scans re-read every byte per
    phrase; the positional index reuses one tokenization and each
    additional phrase term is a join on an already-tiny frame."""
    terms = phrase.split()
    if not terms:
        raise ValueError("empty phrase")
    pos = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "tok"))
    out = (pos.where(F.col("tok") == terms[0])
           .select(id_col, "pos"))
    for i, term in enumerate(terms[1:], start=1):
        nxt = (pos.where(F.col("tok") == term)
               .select(F.col(id_col),
                       (F.col("pos") - i).alias("pos")))
        out = out.join(nxt, [id_col, "pos"])
    return (out.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences")))
