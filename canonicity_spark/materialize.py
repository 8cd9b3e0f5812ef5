"""Graph materialization stage (SURVEY.md §2.F M1–M4).

Spec: BASELINE.json:6 — "graph materialization into Iceberg
(subj, pred, obj) triple and entity tables". The triples table is the
graded output (P/R vs the reference corpus, BASELINE.json:2).

Scale notes:
- M1 is two shuffled equi-joins (subj, then obj) of raw_triples against
  the mention→entity map, both on mention_id — high-cardinality evenly
  distributed keys (content-hash ids), so no skew treatment needed; AQE
  handles partition sizing.
- M2's groupBy(subj, pred, obj) *is* skew-exposed (hot entities appear
  in many triples) but min/max/count aggregations get map-side partial
  aggregation from Spark automatically, which neutralizes it.
- Output is sorted within partitions (M4) so repeated runs produce
  byte-identical files for the resume test (BASELINE.json:14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_triples(
    raw_triples: DataFrame,
    surface_map: DataFrame,
    skew_threshold: int | None = None,
) -> DataFrame:
    """M1 — rewrite subject/object surfaces to canonical entity ids.

    raw_triples carry the normalized surface of each endpoint (written
    at extract time from the same parsed sentence row), so resolution
    is two joins against the *vocabulary-sized* surface→entity map —
    never a mention-scale join. The map is orders of magnitude smaller
    than the triples; Spark broadcasts it when it fits the threshold
    and falls back to a shuffle join (AQE skew-aware) when a web-scale
    vocabulary doesn't.

    ``skew_threshold``: opt-in pathological-hot-key handling for the
    shuffle-join regime (a celebrity surface that is a large fraction
    of all triples). When set, both M1 joins route through
    ``skew.hot_key_join``: surfaces with more than ``skew_threshold``
    triple rows are split out and broadcast-joined BEFORE the shuffle
    materializes a whole celebrity partition on one reducer (AQE can
    only split it after). Default off because the detection aggregate
    is an extra pass over mention-scale triples — pay it only when the
    corpus is known celebrity-skewed AND the surface map exceeds the
    broadcast threshold (a broadcast M1 join has no skew problem).
    Output is identical either way (skew.hot_key_join equivalence is
    pinned in tests/unit/test_skew.py).

    Subjects/objects without a surface keep their literal (media-span
    doc subjects, year/count objects).
    """
    from canonicity_spark import skew

    subj_map = surface_map.select(
        F.col("norm_surface").alias("subj_norm_surface"),
        F.col("entity_id").alias("subj_entity"),
    )
    obj_map = surface_map.select(
        F.col("norm_surface").alias("obj_norm_surface"),
        F.col("entity_id").alias("obj_entity"),
    )
    if skew_threshold is not None:
        resolved = skew.hot_key_join(
            skew.hot_key_join(
                raw_triples, subj_map, "subj_norm_surface", "left", skew_threshold
            ),
            obj_map,
            "obj_norm_surface",
            "left",
            skew_threshold,
        )
    else:
        resolved = raw_triples.join(subj_map, "subj_norm_surface", "left").join(
            obj_map, "obj_norm_surface", "left"
        )
    return (
        resolved
        .select(
            "doc_id",
            F.coalesce("subj_entity", "subj_literal").alias("subj"),
            "pred",
            F.coalesce("obj_entity", "obj_literal").alias("obj"),
            "conf",
        )
        .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    )


def aggregate_triples(resolved: DataFrame) -> DataFrame:
    """M2 — collapse duplicates: max confidence, support count."""
    return resolved.groupBy("subj", "pred", "obj").agg(
        F.max("conf").alias("conf"), F.count("*").alias("n_support")
    )


def run(
    raw_triples: DataFrame,
    surface_map: DataFrame,
    skew_threshold: int | None = None,
) -> DataFrame:
    """raw_triples ⋈ surface_map -> deterministic triples table."""
    return aggregate_triples(
        resolve_triples(raw_triples, surface_map, skew_threshold=skew_threshold)
    ).sortWithinPartitions("subj", "pred", "obj")
