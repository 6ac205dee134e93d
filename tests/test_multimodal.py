import pytest
from pyspark.sql import functions as F

from logging_spark import multimodal as M
from logging_spark import synth


@pytest.fixture(scope="module")
def media(spark):
    return synth.media(spark, n=60).cache()


def test_extract_features_shape(media):
    out = M.extract_features(media).collect()
    assert len(out) == 60
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in out)
    assert all(r["n_bytes"] > 0 for r in out)
    # deterministic: same payload -> same feature
    again = M.extract_features(media).collect()
    assert {r["media_id"]: list(r["feature"]) for r in out} == \
           {r["media_id"]: list(r["feature"]) for r in again}


def test_decode_stub_gate(media):
    with pytest.raises(Exception) as exc:
        M.extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or "not in this image" in str(exc.value)


def test_resize_math(media):
    rows = M.resize_images(media, max_side=100).collect()
    assert rows
    for r in rows:
        assert max(r["out_width"], r["out_height"]) <= 100 or (
            max(r["width"], r["height"]) <= 100
        )


def test_sample_frames(media):
    rows = M.sample_frames(media, every_ms=60_000).collect()
    assert rows and all(r["frame_ts_ms"] % 60_000 == 0 for r in rows)


def test_per_kind_stats_prunes_payload(media):
    stats = M.per_kind_stats(media)
    got = {r["kind"]: r["n_items"] for r in stats.collect()}
    assert sum(got.values()) == 60
    # plan prints top-down: everything ABOVE the Exchange is the
    # post-shuffle side — the shuffled rows must not carry the payload
    explained = stats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in explained
    post_shuffle = explained.split("Exchange")[0]
    assert "payload" not in post_shuffle
