"""Deterministic sampling/splitting/mixing/shuffle (operators/sample.py)."""

from pyspark.sql import functions as F

from logging_spark.operators.sample import (deterministic_sample,
                                            deterministic_split,
                                            global_shuffle, mix_corpora)


def _corpus(spark, n=400):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 F.concat(F.lit("doc "), "id").alias("text"))


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_deterministic_and_partition_invariant(spark):
    df = _corpus(spark)
    a = _ids(deterministic_sample(df, 0.3, seed="x"))
    b = _ids(deterministic_sample(df.repartition(13), 0.3, seed="x"))
    assert a == b
    # roughly the right size (binomial, 400 draws)
    assert 0.2 * 400 < len(a) < 0.4 * 400
    # a different seed is a different (overlapping but not equal) set
    assert a != _ids(deterministic_sample(df, 0.3, seed="y"))


def test_sample_nesting_composes_like_subsets(spark):
    df = _corpus(spark)
    small = _ids(deterministic_sample(df, 0.2, seed="x"))
    big = _ids(deterministic_sample(df, 0.6, seed="x"))
    assert small <= big  # same seed: shrinking the rate only removes rows


def test_split_covers_each_row_exactly_once(spark):
    df = _corpus(spark)
    out = deterministic_split(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                              seed="x")
    rows = out.groupBy("split").count().collect()
    assert sum(r["count"] for r in rows) == 400
    by = {r["split"]: r["count"] for r in rows}
    assert set(by) == {"train", "val", "test"}
    assert by["train"] > by["val"] and by["train"] > by["test"]


def test_split_growth_only_moves_the_boundary(spark):
    # growing 'a' must only convert b-rows to a-rows, never the reverse
    df = _corpus(spark)
    w1 = deterministic_split(df, {"a": 0.5, "b": 0.5}, seed="x")
    w2 = deterministic_split(df, {"a": 0.7, "b": 0.3}, seed="x")
    a1 = _ids(w1.where(F.col("split") == "a"))
    a2 = _ids(w2.where(F.col("split") == "a"))
    assert a1 <= a2


def test_mix_tags_and_rates(spark):
    docs = _corpus(spark)
    out = mix_corpora({"web": (docs, 1.0), "code": (docs, 0.25)}, seed="m")
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert counts["web"] == 400          # rate 1.0 keeps everything
    assert 0.1 * 400 < counts["code"] < 0.45 * 400
    # same id can appear under both tags (independent membership)
    assert out.count() == counts["web"] + counts["code"]


def test_global_shuffle_reproducible_total_order(spark):
    df = _corpus(spark)
    p1 = [r["doc_id"] for r in
          global_shuffle(df, seed="e1", num_partitions=4).collect()]
    p2 = [r["doc_id"] for r in
          global_shuffle(df.repartition(7), seed="e1",
                         num_partitions=4).collect()]
    assert p1 == p2                      # same seed: same permutation
    assert sorted(p1) == list(range(400))
    p3 = [r["doc_id"] for r in
          global_shuffle(df, seed="e2", num_partitions=4).collect()]
    assert p1 != p3                      # new seed: new epoch order


def test_domain_cap_limits_and_is_deterministic(spark):
    from logging_spark.operators.sample import domain_cap
    df = _corpus(spark).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 3)))
    capped = domain_cap(df, domain_col="source", k=50, seed="c1")
    counts = {r["source"]: r["count"]
              for r in capped.groupBy("source").count().collect()}
    assert all(v == 50 for v in counts.values())        # 133+ docs each
    # partition-invariant membership (pure function of seed+id)
    again = domain_cap(df.repartition(11), domain_col="source", k=50,
                       seed="c1")
    assert _ids(capped) == _ids(again)
    # different seed draws a different survivor set
    assert _ids(capped) != _ids(
        domain_cap(df, domain_col="source", k=50, seed="c2"))
    # domains under the cap pass through whole
    small = domain_cap(df.where(F.col("doc_id") < 30),
                       domain_col="source", k=50, seed="c1")
    assert small.count() == 30


def test_importance_scores_rank_target_like_docs(spark):
    from logging_spark.operators.importance import importance_scores

    target_text = "alpha beta gamma delta alpha beta"
    docs = spark.createDataFrame(
        [(1, target_text),                       # exactly the target
         (2, "alpha beta gamma unrelated tail"),  # partial overlap
         (3, "zero overlap with anything here")],
        "doc_id long, text string")
    target = spark.createDataFrame([(9, target_text)],
                                   "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            importance_scores(docs, target, buckets=512).collect()}
    # per-gram average weight orders by target affinity
    avg = {d: rows[d]["score"] / rows[d]["n_grams"] for d in rows}
    assert avg[1] > avg[2] > avg[3]
    # deterministic under repartitioning
    rows2 = {r["doc_id"]: r for r in
             importance_scores(docs.repartition(7), target,
                               buckets=512).collect()}
    assert {d: rows2[d]["score"] for d in rows2} == \
           {d: rows[d]["score"] for d in rows}


def test_stratified_balance_equalizes_to_min_class(spark):
    from logging_spark.operators.sample import stratified_balance
    rows = ([(i, "big") for i in range(20)]
            + [(100 + i, "mid") for i in range(7)]
            + [(200 + i, "small") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_balance(df, "lang", seed="x")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 3, "mid": 3, "small": 3}
    # deterministic: same seed -> same membership, any partitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               stratified_balance(df.repartition(7), "lang",
                                  seed="x").collect())
    assert a == b
    # different seed -> (almost surely) different big-class pick
    c = sorted(r["doc_id"] for r in
               stratified_balance(df, "lang", seed="y").collect())
    assert a != c


def test_stratified_balance_fixed_k(spark):
    from logging_spark.operators.sample import stratified_balance
    rows = [(i, "a") for i in range(10)] + [(50 + i, "b") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_balance(df, "lang", seed="x", k=5)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 5, "b": 2}  # k caps, short groups untouched


def test_global_order_is_partitioning_independent(spark):
    from logging_spark.operators.sample import global_order
    from pyspark.sql import Row
    import random
    rows = [Row(id=i, v=(i * 37) % 100) for i in range(500)]
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(rows)
    for nparts in (1, 7):
        out = global_order(df.repartition(11), ["v", "id"],
                           num_partitions=nparts).collect()
        got = sorted((r["rank"], r["v"], r["id"]) for r in out)
        expect = sorted(rows, key=lambda r: (r.v, r.id))
        assert [g[0] for g in got] == list(range(500))
        assert [(g[1], g[2]) for g in got] == [(r.v, r.id) for r in expect]
