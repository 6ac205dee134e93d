"""synth.documents: the dedup-scale-probe corpus must be deterministic
at any size, prefix-stable (a doc's text is a pure function of doc_id),
and actually contain the planted exact/near duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from logging_spark import synth


def test_documents_deterministic_and_prefix_stable(spark):
    a = {r["doc_id"]: r["text"]
         for r in synth.documents(spark, n_docs=300).collect()}
    b = {r["doc_id"]: r["text"]
         for r in synth.documents(spark, n_docs=300).collect()}
    assert a == b
    # generating a LARGER corpus must not change the smaller prefix —
    # scale-probe sizes stay comparable
    big = {r["doc_id"]: r["text"]
           for r in synth.documents(spark, n_docs=900).collect()
           if r["doc_id"] < 300}
    assert big == a
    assert len(a) == 300


def test_documents_planted_duplicates(spark):
    df = synth.documents(spark, n_docs=2000)
    # exact dups: same md5 as the previous doc for the dup_pct band
    dups = (df.alias("a").join(
        df.alias("b"), F.expr("a.doc_id = b.doc_id + 1"))
        .where(F.expr("md5(a.text) = md5(b.text)")).count())
    assert dups > 20
    # near dups: first token differs ('variant'), rest shared
    near = df.where(F.col("text").startswith("variant ")).count()
    assert near > 40
    # schema matches the testdata documents table
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
