from pyspark.sql import functions as F

from logging_spark.functions import text as T


def _one(spark, s, col):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_counts(spark):
    assert _one(spark, "a b  c", T.token_count("text")) == 3
    assert _one(spark, "   ", T.token_count("text")) == 0
    assert _one(spark, "", T.token_count("text")) == 0
    assert _one(spark, "a a b", T.distinct_token_count("text")) == 2


def test_bpe_ish_tokens(spark):
    got = _one(spark, "abc123, def!", T.bpe_ish_tokens("text"))
    assert got == ["abc", "123", ",", "def", "!"]


def test_quality_features(spark):
    v = _one(spark, "the cat sat on the mat", T.quality_features("text"))
    assert v["n_tokens"] == 6 and v["n_distinct_tokens"] == 5
    assert v["n_stopwords"] == 2 and v["n_chars"] == 22


def test_lang_guess(spark):
    assert _one(spark, "the cat is on and of the mat", T.lang_guess("text")) == "en"
    assert _one(spark, "der hund ist und bleibt", T.lang_guess("text")) == "de"
    assert _one(spark, "zzz qqq", T.lang_guess("text")) == "und"


def test_fingerprints(spark):
    import hashlib

    assert _one(spark, "hello", T.fingerprint("text")) == hashlib.md5(b"hello").hexdigest()
    # rolling fingerprint is edit-local: appending far from the minimal
    # window usually preserves it; identical strings always match
    a = _one(spark, "x" * 50, T.rolling_fingerprint("text"))
    b = _one(spark, "x" * 50, T.rolling_fingerprint("text"))
    assert a == b


def test_chunk_tokens_reconstructs_text(spark):
    """Chunks with overlap stripped must reconstruct the original
    token stream; every chunk except the last has exactly `chunk`
    tokens."""
    from pyspark.sql import functions as F
    from logging_spark.functions.text import chunk_tokens

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))),
         (2, "only three tokens"),
         (3, " ".join(f"x{i}" for i in range(32)))],
        "doc_id int, text string")
    ch = df.select("doc_id", F.explode(chunk_tokens("text", 32, 8)).alias("c")) \
           .select("doc_id", "c.chunk_idx", "c.chunk_text").collect()
    by_doc = {}
    for r in sorted(ch, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"].split())
    orig = {1: [f"w{i}" for i in range(100)], 2: ["only", "three", "tokens"],
            3: [f"x{i}" for i in range(32)]}
    for doc, chunks in by_doc.items():
        recon = list(chunks[0])
        for c in chunks[1:]:
            assert recon[-8:] == c[:8], f"doc {doc}: overlap mismatch"
            recon.extend(c[8:])
        assert recon == orig[doc], f"doc {doc}: reconstruction failed"
        for c in chunks[:-1]:
            assert len(c) == 32


def test_dedup_lines_keeps_first_occurrence_order(spark):
    s = "alpha\nbeta\nalpha\ngamma\nbeta\nalpha"
    assert _one(spark, s, T.dedup_lines("text")) == "alpha\nbeta\ngamma"
    # no duplicates -> unchanged; single line -> unchanged
    assert _one(spark, "a\nb\nc", T.dedup_lines("text")) == "a\nb\nc"
    assert _one(spark, "only", T.dedup_lines("text")) == "only"
    # empty lines are lines too: repeated blanks collapse to one
    assert _one(spark, "a\n\n\na", T.dedup_lines("text")) == "a\n"
