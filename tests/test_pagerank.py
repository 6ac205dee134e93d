"""pagerank_integer: fixed-point ranks, hand-computed expectations."""

from logging_spark.operators.pagerank import pagerank_integer


def _pr(spark, pairs, iterations):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    out = pagerank_integer(df, iterations=iterations)
    return {r["node"]: (r["pr"], r["deg"]) for r in out.collect()}


def test_one_round_path_graph(spark):
    # a(1)-b(2)-c(3): deg a=1, b=2, c=1; r0 = 1_000_000 each.
    # a <- b's share 500_000 -> 150000 + 425000 = 575000
    # b <- a + c = 2_000_000 -> 150000 + 1_700_000 = 1_850_000
    got = _pr(spark, [(1, 2), (2, 3)], iterations=1)
    assert got == {1: (575_000, 1), 2: (1_850_000, 2), 3: (575_000, 1)}


def test_symmetric_pair_is_fixed_point(spark):
    # two nodes, one edge: each sends its whole rank to the other;
    # 150000 + 85% of 1_000_000 = 1_000_000 -> stable forever
    got = _pr(spark, [(7, 9)], iterations=3)
    assert got == {7: (1_000_000, 1), 9: (1_000_000, 1)}


def test_total_rank_conserved_on_regular_graph(spark):
    # triangle (2-regular): symmetric, so every node stays at scale
    got = _pr(spark, [(1, 2), (2, 3), (1, 3)], iterations=2)
    assert got == {1: (1_000_000, 2), 2: (1_000_000, 2),
                   3: (1_000_000, 2)}


def test_star_center_outranks_leaves(spark):
    got = _pr(spark, [(0, 1), (0, 2), (0, 3)], iterations=3)
    assert got[0][0] > got[1][0] == got[2][0] == got[3][0]
    assert got[0][1] == 3
