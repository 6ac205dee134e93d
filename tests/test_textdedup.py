import itertools
import re

from pyspark.sql import functions as F

from logging_spark.operators import textdedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different content about spark engines"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (4, "another unrelated sentence with words"),
    (5, ""),
    (6, ""),
]
SCHEMA = "doc_id long, text string"


def _jaccard(a: str, b: str, w=3):
    def sh(t):
        toks = t.split()
        if not toks:
            return {""} if False else {" ".join(toks)} if toks else set()
        if len(toks) < w:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}
    A, B = sh(a), sh(b)
    if not A and not B:
        return 0.0
    return len(A & B) / len(A | B)


def test_exact_duplicates(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {(r["keeper_id"], r["n_copies"]) for r in D.exact_duplicates(df).collect()}
    assert got == {(0, 2), (5, 2)}


def test_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d")], SCHEMA)
    got = df.select(D.shingles("text", 3).alias("s")).collect()[0]["s"]
    assert sorted(got) == ["a b c", "b c d"]
    short = spark.createDataFrame([(0, "a b")], SCHEMA)
    got = short.select(D.shingles("text", 3).alias("s")).collect()[0]["s"]
    assert got == ["a b"]


def test_minhash_lsh_finds_near_dups(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    pairs = {(r["doc_a"], r["doc_b"])
             for r in D.lsh_candidate_pairs(df, num_perm=16, bands=8, w=2).collect()}
    # exact dups must always collide; the near-dup pair should at this
    # band setting; unrelated docs must not
    assert (0, 3) in pairs
    assert (0, 1) in pairs and (1, 3) in pairs
    assert (0, 2) not in pairs and (2, 4) not in pairs


def test_minhash_candidates_superset_check_vs_jaccard(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    pairs = {(r["doc_a"], r["doc_b"])
             for r in D.lsh_candidate_pairs(df, num_perm=16, bands=8, w=2).collect()}
    texts = dict([(d, t) for d, t in DOCS])
    for a, b in itertools.combinations(sorted(texts), 2):
        j = _jaccard(texts[a], texts[b], w=2)
        if j >= 0.9 and texts[a]:  # high-sim non-empty pairs must be found
            assert (a, b) in pairs, (a, b, j)


def test_ngram_jaccard_pairs_exact(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = D.ngram_jaccard_pairs(df, w=3).collect()
    got = {(r["doc_a"], r["doc_b"]): (r["n_intersection"], r["n_union"]) for r in rows}
    # docs 0 and 3 identical: intersection == union == 7 shingles
    assert got[(0, 3)] == (7, 7)
    inter, union = got[(0, 1)]
    assert inter == 6 and union == 8  # differ in last word: 6 shared of 7+7
    assert (0, 2) not in got


def test_simhash_properties(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = df.select("doc_id", D.simhash("text").alias("sh")).collect()
    sh = {r["doc_id"]: r["sh"] for r in rows}
    assert sh[0] == sh[3]  # identical docs -> identical signature
    ham01 = bin((sh[0] ^ sh[1]) & (2**64 - 1)).count("1")
    ham02 = bin((sh[0] ^ sh[2]) & (2**64 - 1)).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated


def _py_simhash_portable(text: str, bits: int = 60) -> int:
    """Pure-python reference for simhash(portable=True): per-token
    60-bit hash = int(md5 hex[:15], 16); bit k set iff the +-1 vote
    tally over ALL tokens (duplicates preserved) is > 0."""
    import hashlib

    toks = text.strip().split() if text.strip() else []
    tally = [0] * bits
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for k in range(bits):
            tally[k] += 1 if (h >> k) & 1 else -1
    return sum(1 << k for k in range(bits) if tally[k] > 0)


def test_simhash_portable_matches_python_reference(spark):
    docs = DOCS + [(97, ""), (98, "   "), (99, "dup dup dup one")]
    df = spark.createDataFrame(docs, SCHEMA)
    rows = df.select(
        "doc_id", D.simhash("text", bits=60, portable=True).alias("sh")).collect()
    for r in rows:
        expect = _py_simhash_portable(dict(docs)[r["doc_id"]])
        assert r["sh"] == expect, r["doc_id"]


def test_ngram_jaccard_hot_shingle_cap(spark):
    # 40 docs all sharing one boilerplate shingle ("standard legal
    # footer"), plus one true near-dup pair with unique overlap. With
    # max_doc_freq below 40 the boilerplate-only pairs vanish (the
    # quadratic blowup at scale) while the true pair survives via its
    # unique shingles.
    docs = [(i, f"unique{i} words{i} here{i} standard legal footer")
            for i in range(40)]
    docs.append((100, "alpha beta gamma delta epsilon zeta"))
    docs.append((101, "alpha beta gamma delta epsilon eta"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = {(r["doc_a"], r["doc_b"])
                for r in D.ngram_jaccard_pairs(df, w=3, max_doc_freq=None).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in D.ngram_jaccard_pairs(df, w=3, max_doc_freq=10).collect()}

    assert (0, 1) in uncapped          # boilerplate-only pair exists uncapped
    assert (0, 1) not in capped        # excluded once the hot shingle is dropped
    assert (100, 101) in capped        # true near-dup still found
    # boilerplate pairs dominate the uncapped result: the cap removes
    # the quadratic term, not the signal
    assert len(capped) < len(uncapped)


def test_decontaminate_drops_benchmark_overlap(spark):
    from logging_spark.operators.textdedup import (contamination_hits,
                                                   decontaminate)

    mk = " ".join(f"tok{i}" for i in range(30))          # 28 shingles
    other = " ".join(f"zzz{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, mk),                                        # exact eval copy
         (2, mk + " extra trailing words here"),         # superset: contaminated
         (3, other),                                     # disjoint: clean
         (4, "tok0 tok1 tok2 tok3 tok4")],               # 3 shared shingles < min_hits
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, mk)], "doc_id long, text string")

    hits = {r["doc_id"]: r["n_hits"]
            for r in contamination_hits(docs, bench, w=3).collect()}
    assert hits[1] == 28 and hits[2] >= 28 and hits[4] == 3
    assert 3 not in hits                                 # no shared shingles

    kept = {r["doc_id"] for r in
            decontaminate(docs, bench, w=3, min_hits=10).collect()}
    assert kept == {3, 4}


def test_hashed_decontaminate_matches_exact_superset(spark):
    from logging_spark.operators.textdedup import (hashed_decontaminate,
                                                   hashed_contamination_hits,
                                                   contamination_hits,
                                                   decontaminate)

    mk = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"zzz{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, mk), (2, mk + " extra trailing words here"),
         (3, other), (4, "tok0 tok1 tok2 tok3 tok4")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, mk)], "doc_id long, text string")

    # no false negatives: bloom hit counts >= exact hit counts per doc
    exact = {r["doc_id"]: r["n_hits"]
             for r in contamination_hits(docs, bench, w=3).collect()}
    hashed = {r["doc_id"]: r["n_hits"]
             for r in hashed_contamination_hits(docs, bench, w=3).collect()}
    for d, n in exact.items():
        assert hashed.get(d, 0) >= n
    # survivors are a subset of the exact operator's survivors; at this
    # tiny scale (4M-slot space, ~60 items) collisions ~ 0 so they coincide
    kept_exact = {r["doc_id"] for r in
                  decontaminate(docs, bench, w=3, min_hits=10).collect()}
    kept_hashed = {r["doc_id"] for r in
                   hashed_decontaminate(docs, bench, w=3, min_hits=10).collect()}
    assert kept_hashed <= kept_exact
    assert kept_hashed == {3, 4}


def test_jaccard_threshold_prefix_filter(spark):
    from logging_spark.operators.textdedup import (jaccard_threshold_pairs,
                                                   shingles)
    from pyspark.sql import functions as F

    # near-dup pair (1,2): differ by one appended token; (3) disjoint;
    # (4) shares only the corpus's most COMMON shingle with (1) — the
    # prefix filter must still judge correctly via rare-first ordering
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " iota"),
         (3, "one two three four five six seven"),
         (4, "alpha beta gamma completely different tail here")],
        "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["uni"])
           for r in jaccard_threshold_pairs(docs, t_pct=50, w=3).collect()}
    # sets: |1|=6, |2|=7, inter=6 -> J=6/7 >= 0.5 ; (1,4) inter=1 -> no
    assert set(got) == {(1, 2)} and got[(1, 2)] == (6, 7)

    # the point of the filter: the prefix index is a strict subset of
    # the full inverted index
    sh = docs.select("doc_id", shingles("text", 3).alias("s"))
    full = sh.select(F.explode("s")).count()
    t = 50
    plen = (F.size("s") - ((F.size("s") * t + 99) / 100).cast("long") + 1)
    pref = sh.select(F.least(plen, F.size("s")).alias("p")) \
             .agg(F.sum("p")).collect()[0][0]
    assert pref < full


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    from logging_spark.operators.textdedup import (containment_pairs,
                                                   ngram_jaccard_pairs)
    quote = " ".join(f"q{i}" for i in range(12))
    big = " ".join(f"w{i}" for i in range(300)) + " " + quote
    df = spark.createDataFrame([(1, quote), (2, big)],
                               "doc_id long, text string")
    cont = containment_pairs(df, w=3, threshold_bps=9000).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_bps == 10000   # quote fully inside big
    # symmetric Jaccard on the same pair is tiny (~3%)
    jac = ngram_jaccard_pairs(df, w=3, min_intersection=1).collect()[0]
    assert jac.n_intersection * 100 < jac.n_union * 5
