from pyspark.sql import functions as F

from logging_spark.operators.rules import Rule, load_rules
from logging_spark.schema import DEFAULT_MAX_LENGTH, MATCH_ALL_EXPR, RULES

ROWS = [
    ("conv-0", 0, "user", "[ERROR] sink: rejected code=1 shard=2"),
    ("conv-0", 1, "assistant", "[INFO] gc: queued code=2 shard=3"),
    ("conv-1", 0, "tool", "[WARN] net: timeout code=3 shard=4"),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _matches(spark, rule):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return [r["turn_idx"] for r in df.where(rule.predicate()).orderBy("conv_id", "turn_idx").collect()]


def test_match_all_star(spark):
    assert len(_matches(spark, Rule("s", expr=MATCH_ALL_EXPR))) == 3


def test_regex_expr(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = df.where(Rule("s", expr=r"\[ERROR\]").predicate()).collect()
    assert len(got) == 1 and got[0]["conv_id"] == "conv-0" and got[0]["turn_idx"] == 0


def test_role_filter_and_disabled(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    assert df.where(Rule("s", role_filter="tool").predicate()).count() == 1
    assert df.where(Rule("s", enabled=False).predicate()).count() == 0


def test_truncate_bound_and_default(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = df.select(Rule("s", max_length=7).truncate().alias("t")).collect()
    assert all(len(r["t"]) == 7 for r in out)
    # default bound 1e9 = unbounded -> truncate is the identity column
    assert Rule("s").truncate()._jc.equals(F.col("text")._jc)


def test_load_rules_defaults_on_null(spark):
    # mirrors Filter-not-found default {max_length:1e9, expr:"*"}
    # (reference service.go:130-144)
    df = spark.createDataFrame([("s1", None, None, None, True)], RULES)
    [r] = load_rules(df)
    assert r.expr == MATCH_ALL_EXPR and r.max_length == DEFAULT_MAX_LENGTH


def test_route_join_equivalent_to_route(spark):
    """The broadcast-join router (scale path for huge rule tables) must
    produce exactly the rows of the expression-compiled router."""
    from pyspark.sql import functions as F
    from logging_spark import synth
    from logging_spark.operators.route import route, route_join
    from logging_spark.operators.rules import load_rules

    turns = synth.transcripts(spark, n_conversations=30, turns_per_conv=10)
    rules_df = synth.rules(spark)
    a = route(turns, load_rules(rules_df))
    b = route_join(turns, rules_df)
    cols = ["sink_name", "conv_id", "turn_idx", "role", "text"]
    ra = sorted(map(tuple, a.select(*cols).collect()))
    rb = sorted(map(tuple, b.select(*cols).collect()))
    assert ra == rb
