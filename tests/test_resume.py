"""Resume/idempotence (SURVEY §5.4): run, damage the checkpoint, re-run
-> identical final outputs; completed buckets are skipped."""

import pytest
from pyspark.sql import functions as F

from logging_spark import synth
from logging_spark.plans.job import ROUTED_TABLE, run_pipeline
from logging_spark.sources.catalog import Catalog
from logging_spark.sources.checkpoint import CHECKPOINT_TABLE


@pytest.fixture(scope="module")
def fixtures(spark):
    turns = synth.transcripts(spark, n_conversations=40, turns_per_conv=15,
                              hot_conversations=1, hot_factor=10)
    lookup = synth.lookup(spark, n_conversations=40)
    rules = synth.rules(spark)
    return turns, lookup, rules


def _snapshot(cat):
    counts = {tuple(r) for r in cat.read("agg.per_sink_counts").collect()}
    routed = cat.read(ROUTED_TABLE).agg(
        F.count(F.lit(1)),
        F.expr("bit_xor(xxhash64(sink_name, conv_id, turn_idx, text))"),
    ).collect()[0]
    return counts, tuple(routed)


def test_rerun_after_partial_checkpoint_loss(spark, fixtures, tmp_path_factory):
    turns, lookup, rules = fixtures
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    r1 = run_pipeline(spark, turns, lookup, rules, cat, num_buckets=8,
                      input_snapshot="snap-A")
    want = _snapshot(cat)
    assert r1.buckets_skipped == 0

    # lose half the checkpoint rows (simulated partial failure):
    # rewrite the checkpoint table keeping buckets < 4
    cp = cat.read(CHECKPOINT_TABLE).where(F.col("bucket") < 4).collect()
    cat.drop(CHECKPOINT_TABLE)
    if cp:
        cat.append(spark.createDataFrame(cp), CHECKPOINT_TABLE)

    r2 = run_pipeline(spark, turns, lookup, rules, cat, num_buckets=8,
                      input_snapshot="snap-A")
    assert r2.buckets_skipped > 0  # surviving buckets were not redone
    assert _snapshot(cat) == want  # outputs identical, no double-writes


def test_fully_checkpointed_run_is_noop_on_sinks(spark, fixtures, tmp_path_factory):
    turns, lookup, rules = fixtures
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    run_pipeline(spark, turns, lookup, rules, cat, num_buckets=4,
                 input_snapshot="snap-B")
    want = _snapshot(cat)
    r2 = run_pipeline(spark, turns, lookup, rules, cat, num_buckets=4,
                      input_snapshot="snap-B")
    assert r2.buckets_skipped == 4
    assert _snapshot(cat) == want


def test_new_snapshot_reprocesses(spark, fixtures, tmp_path_factory):
    turns, lookup, rules = fixtures
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    run_pipeline(spark, turns, lookup, rules, cat, num_buckets=4,
                 input_snapshot="snap-C")
    r2 = run_pipeline(spark, turns, lookup, rules, cat, num_buckets=4,
                      input_snapshot="snap-D")
    assert r2.buckets_skipped == 0


def test_crashed_bucket_partial_write_is_overwritten(spark, fixtures, tmp_path_factory):
    """A bucket that crashed mid-write leaves stale rows in its sink
    partitions but no checkpoint row. The re-run's dynamic partition
    overwrite must replace those partitions wholesale — no garbage
    survives, counts exact."""
    import os
    turns, lookup, rules = fixtures
    wh = str(tmp_path_factory.mktemp("wh"))
    cat = Catalog(spark, wh)
    run_pipeline(spark, turns, lookup, rules, cat, num_buckets=8,
                 input_snapshot="snap-E")
    want = _snapshot(cat)

    # un-checkpoint bucket 2, then plant garbage rows in one of its
    # sink partitions (simulating a crash after a partial write)
    cp = cat.read(CHECKPOINT_TABLE).where(F.col("bucket") != 2).collect()
    cat.drop(CHECKPOINT_TABLE)
    cat.append(spark.createDataFrame(cp), CHECKPOINT_TABLE)
    part_dir = os.path.join(wh, "sinks", "routed", "sink_name=errors", "bucket=2")
    garbage = spark.createDataFrame(
        [("conv-GARBAGE", -1, "assistant", "[ERROR] bogus: crashed-partial-row",
          None, None, None, None, None, "ns-0", "pod-0", "node-0", "svc-0")],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, level string, component string, attrs string, "
        "namespace string, pod_name string, node_name string, service_name string")
    garbage.write.mode("append").parquet(part_dir)
    assert cat.read(ROUTED_TABLE).where(
        F.col("conv_id") == "conv-GARBAGE").count() == 1  # damage visible

    r2 = run_pipeline(spark, turns, lookup, rules, cat, num_buckets=8,
                      input_snapshot="snap-E")
    assert r2.buckets_skipped == 7
    assert cat.read(ROUTED_TABLE).where(
        F.col("conv_id") == "conv-GARBAGE").count() == 0  # partition rewritten
    assert _snapshot(cat) == want


def test_merge_upsert_field_wise(spark, tmp_path_factory):
    """S5 Apply with reference merge semantics (datasource.go:206-276):
    a NULL field in an update row preserves the existing value; new
    keys insert; re-applying the same update is idempotent."""
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    schema = "k string, a string, b string"
    cat.merge_upsert(
        spark.createDataFrame([("k1", "a1", "b1"), ("k2", "a2", "b2")], schema),
        "cfg.rules", keys=["k"])
    # partial update: b=None must NOT clobber existing b1; k3 inserts
    upd = spark.createDataFrame([("k1", "a1x", None), ("k3", "a3", None)], schema)
    cat.merge_upsert(upd, "cfg.rules", keys=["k"])
    got = {r["k"]: (r["a"], r["b"]) for r in cat.read("cfg.rules").collect()}
    assert got == {"k1": ("a1x", "b1"), "k2": ("a2", "b2"), "k3": ("a3", None)}
    # idempotent re-apply
    cat.merge_upsert(upd, "cfg.rules", keys=["k"])
    got2 = {r["k"]: (r["a"], r["b"]) for r in cat.read("cfg.rules").collect()}
    assert got2 == got


def test_merge_upsert_latest_wins_order_col(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    schema = "k string, v string, ts long"
    cat.merge_upsert(spark.createDataFrame([("k1", "old", 1)], schema),
                     "cfg.vals", keys=["k"], order_col="ts")
    # two update rows for the same key: highest ts wins
    upd = spark.createDataFrame([("k1", "mid", 5), ("k1", "new", 9)], schema)
    cat.merge_upsert(upd, "cfg.vals", keys=["k"], order_col="ts")
    rows = cat.read("cfg.vals").collect()
    assert len(rows) == 1 and rows[0]["v"] == "new" and rows[0]["ts"] == 9


def test_compact_small_files(spark, tmp_path):
    from pyspark.sql import functions as F
    from logging_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("sink"),
        F.md5(F.col("id").cast("string")).alias("text"))
    # simulate a micro-batch-riddled sink: 40 tiny appends
    for i in range(40):
        cat.append(df.where(F.col("id") % 40 == i).coalesce(1), "sink_tbl")
    import os
    path = cat._path("sink_tbl")
    before = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert before >= 40
    pre = sorted(r["id"] for r in cat.read("sink_tbl").collect())

    n_after = cat.compact("sink_tbl", target_file_bytes=10 << 20)
    assert n_after < before / 10
    # byte-for-byte the same table
    post = sorted(r["id"] for r in cat.read("sink_tbl").collect())
    assert post == pre
    # no debris from the swap
    assert not os.path.exists(path + ".old")


def test_erase_rows_right_to_be_forgotten(spark, tmp_path):
    from logging_spark.sources.catalog import Catalog
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(u, i, f"text-{u}-{i}") for u in ("alice", "bob", "carol")
         for i in range(10)],
        "user string, seq int, text string")
    cat.append(df, "sink.events")
    n = cat.erase_rows("sink.events", "user = 'bob'")
    assert n == 10
    back = cat.read("sink.events")
    assert back.count() == 20
    assert back.where("user = 'bob'").count() == 0
    # NULL-safe: predicate false/NULL rows survive; repeat is a no-op
    assert cat.erase_rows("sink.events", "user = 'bob'") == 0
    assert cat.read("sink.events").count() == 20
