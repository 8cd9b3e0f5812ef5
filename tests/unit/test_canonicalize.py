"""Unit tests for canonicalization (SURVEY.md §2.E G1–G8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from canonicity_spark import canonicalize


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0, "t") for a, b in pairs], ["src", "dst", "w", "etype"]
    )


def _cc_py(pairs):
    """Pure-Python union-find oracle (SURVEY.md §5 property b)."""
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {n: find(n) for n in list(parent)}


def test_cc_chain_multiround(spark):
    # a chain forces multiple propagation rounds — run the DISTRIBUTED
    # kernel explicitly (driver_max_edges=0), since the default now
    # routes small graphs to the driver union-find
    pairs = [(f"n{i}", f"n{i+1}") for i in range(9)]
    labels = {
        r.node: r.label
        for r in canonicalize.connected_components(
            _edges(spark, pairs), driver_max_edges=0
        ).collect()
    }
    assert set(labels.values()) == {"n0"}
    assert len(labels) == 10


def test_cc_matches_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = [f"v{i:03d}" for i in range(60)]
    pairs = [tuple(rng.sample(nodes, 2)) for _ in range(45)]
    e = _edges(spark, pairs)
    want = _cc_py(pairs)
    distributed = {
        r.node: r.label
        for r in canonicalize.connected_components(e, driver_max_edges=0).collect()
    }
    assert distributed == want
    # the driver fast path (default routing for a 45-edge graph) must be
    # bit-identical to the distributed kernel, including exactly at the
    # edge-count boundary
    for cap in (len(pairs), 10**6):
        driver = {
            r.node: r.label
            for r in canonicalize.connected_components(
                e, driver_max_edges=cap
            ).collect()
        }
        assert driver == want
    below = {
        r.node: r.label
        for r in canonicalize.connected_components(
            e, driver_max_edges=len(pairs) - 1  # one under: distributed again
        ).collect()
    }
    assert below == want


def test_cc_chain_rounds_logarithmic(spark):
    """Round 8 (VERDICT round 7 #3): the distributed kernel carries a
    pointer-doubling shortcut leg (l(l(v)) joins each round's
    min-aggregate), so a high-diameter chain converges in O(log d)
    rounds instead of O(d). d=64 chain: plain one-hop propagation needs
    64+ rounds; the bound here is 2*log2(d) + 2 slack."""
    import math

    d = 64
    pairs = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(d)]
    stats: dict = {}
    labels = {
        r.node: r.label
        for r in canonicalize.connected_components(
            _edges(spark, pairs), max_iter=50, driver_max_edges=0, stats=stats
        ).collect()
    }
    assert set(labels.values()) == {"c000"} and len(labels) == d + 1
    assert stats["rounds"] <= 2 * int(math.log2(d)) + 2, stats


def test_cc_max_iter_zero_returns_initial_labels(spark):
    """max_iter < 1 on the distributed path must return the (unconverged)
    initial labels and still fill stats — ADVICE round 7: the stats
    update read the unbound loop variable and raised NameError."""
    pairs = [("a", "b"), ("b", "c")]
    stats: dict = {}
    labels = {
        r.node: r.label
        for r in canonicalize.connected_components(
            _edges(spark, pairs), max_iter=0, driver_max_edges=0, stats=stats
        ).collect()
    }
    assert stats == {"path": "distributed", "rounds": 0}
    assert labels == {"a": "a", "b": "b", "c": "c"}


def test_salting_invariance(spark):
    pairs = [("a", "b"), ("b", "c"), ("x", "y"), ("c", "hub")] + [
        (f"leaf{i}", "hub") for i in range(20)
    ]
    e = _edges(spark, pairs)
    # distributed kernel explicitly — salting is a property of the
    # iterative path's aggregation, which the driver fast path bypasses
    with_salt = {
        r.node: r.label
        for r in canonicalize.connected_components(
            e, use_salting=True, driver_max_edges=0
        ).collect()
    }
    without = {
        r.node: r.label
        for r in canonicalize.connected_components(
            e, use_salting=False, driver_max_edges=0
        ).collect()
    }
    assert with_salt == without


def test_component_entity_and_mention_map(spark):
    links = spark.createDataFrame(
        [("acme", "E1", 1.0), ("acme corp", "E1", 0.9), ("zed", "new:zed", 0.0)],
        ["norm_surface", "entity_id", "score"],
    )
    labels = canonicalize.connected_components(canonicalize.build_edges(links))
    smap = {
        r.norm_surface: r.entity_id
        for r in canonicalize.surface_entity_map(labels).collect()
    }
    assert smap == {"acme": "E1", "acme corp": "E1", "zed": "new:zed"}
    mentions = spark.createDataFrame(
        [("m1", "acme"), ("m2", "acme corp"), ("m3", "zed")],
        ["mention_id", "norm_surface"],
    )
    mm = {
        r.mention_id: r.entity_id
        for r in canonicalize.mention_entity_map(mentions, labels).collect()
    }
    assert mm == {"m1": "E1", "m2": "E1", "m3": "new:zed"}


def test_canonical_entities_table(spark):
    surface_map = spark.createDataFrame(
        [("acme corp", "E1"), ("acme", "E1"), ("zed", "new:zed")],
        ["norm_surface", "entity_id"],
    )
    mentions = spark.createDataFrame(
        [
            ("m1", "acme corp"),
            ("m2", "acme corp"),
            ("m3", "acme"),
            ("m4", "zed"),
        ],
        ["mention_id", "norm_surface"],
    )
    pool = spark.createDataFrame([("E1", "acme corp")], ["entity_id", "canonical_name"])
    ents = {
        r.entity_id: r
        for r in canonicalize.canonical_entities(surface_map, mentions, pool).collect()
    }
    assert ents["E1"].canonical_name == "acme corp"
    assert ents["E1"].aliases == ["acme", "acme corp"]  # sorted (G8 determinism)
    assert ents["E1"].n_mentions == 3
    assert ents["new:zed"].canonical_name == "zed"  # most frequent surface fallback
    # round 4: a precomputed surface_freq (what the pipeline feeds from
    # the surface_links stage) must yield the identical table — no
    # mention-scale rescan
    freq = spark.createDataFrame(
        [("acme corp", 2), ("acme", 1), ("zed", 1)], ["norm_surface", "freq"]
    )
    via_freq = {
        r.entity_id: r
        for r in canonicalize.canonical_entities(
            surface_map, None, pool, surface_freq=freq
        ).collect()
    }
    assert {k: tuple(v) for k, v in via_freq.items()} == {
        k: tuple(v) for k, v in ents.items()
    }
