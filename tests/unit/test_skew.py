"""Skew-handling equivalence tests (SURVEY.md §2 G6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from canonicity_spark import skew


def _skewed(spark):
    # key 'hot' holds 90% of rows, plus a long tail
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    big = spark.createDataFrame(rows, ["k", "v"])
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"S{i}") for i in range(50)], ["k", "name"]
    )
    return big, small


def test_hot_key_join_inner_equivalent(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k", "inner")
    robust = skew.hot_key_join(big, small, "k", "inner", threshold=100)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, robust.collect()))


def test_hot_key_join_left_equivalent(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k", "left")
    robust = skew.hot_key_join(big, small, "k", "left", threshold=100)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, robust.collect()))


def test_hot_slice_actually_broadcasts(spark):
    big, small = _skewed(spark)
    plan = skew.hot_key_join(big, small, "k", "inner", threshold=100)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_no_hot_keys_degenerates_cleanly(spark):
    big = spark.createDataFrame([(f"k{i}", i) for i in range(100)], ["k", "v"])
    small = spark.createDataFrame([(f"k{i}", f"S{i}") for i in range(100)], ["k", "n"])
    plain = big.join(small, "k", "inner")
    robust = skew.hot_key_join(big, small, "k", "inner", threshold=1000)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, robust.collect()))

def test_m1_skew_threshold_equivalent(spark):
    """The opt-in M1 hot-key split (PipelineConf.m1_skew_threshold ->
    materialize.run) produces the exact same triples table as the
    default join strategy, on a corpus with one celebrity subject
    surface holding most of the triples."""
    from canonicity_spark import materialize

    rows = [
        (f"d{i}", "bob dylan", None, "wrote", None, f"song {i % 7}", 0.9)
        for i in range(300)
    ] + [
        ("dx", "alice", None, "knows", "bob dylan", None, 0.8),
        ("dy", None, "doc:dy", "hasMedia", None, "media://dy", 1.0),
    ]
    raw = spark.createDataFrame(
        rows,
        "doc_id string, subj_norm_surface string, subj_literal string, "
        "pred string, obj_norm_surface string, obj_literal string, conf double",
    )
    sm = spark.createDataFrame(
        [("bob dylan", "E1"), ("alice", "E2")], ["norm_surface", "entity_id"]
    )
    plain = sorted(map(tuple, materialize.run(raw, sm).collect()))
    split = sorted(
        map(tuple, materialize.run(raw, sm, skew_threshold=100).collect())
    )
    assert plain == split and len(plain) > 0
