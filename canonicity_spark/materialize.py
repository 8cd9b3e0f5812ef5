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
    raw_triples: DataFrame, mentions: DataFrame, surface_map: DataFrame
) -> DataFrame:
    """M1 — rewrite subject/object mention ids to canonical entity ids.

    The mention→entity mapping is composed lazily from the mentions
    table (mention_id → norm_surface, column-pruned scan) and the
    vocabulary-sized surface→entity map — it is never materialized at
    mention scale. The surface-map join is broadcastable whenever the
    vocabulary fits (the optimizer/AQE decides); the two mention-id
    joins are the only mention-scale shuffles in the stage, on evenly
    distributed content-hash keys.

    Subjects/objects without a mention id keep their literal
    (media-span doc subjects, year/count objects).
    """
    mention_entity = mentions.select("mention_id", "norm_surface").join(
        surface_map, "norm_surface", "inner"
    )
    subj_map = mention_entity.select(
        F.col("mention_id").alias("subj_mention_id"),
        F.col("entity_id").alias("subj_entity"),
    )
    obj_map = mention_entity.select(
        F.col("mention_id").alias("obj_mention_id"),
        F.col("entity_id").alias("obj_entity"),
    )
    return (
        raw_triples.join(subj_map, "subj_mention_id", "left")
        .join(obj_map, "obj_mention_id", "left")
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
    raw_triples: DataFrame, mentions: DataFrame, surface_map: DataFrame
) -> DataFrame:
    """raw_triples resolved through mentions ⋈ surface_map ->
    deterministic triples table."""
    return aggregate_triples(
        resolve_triples(raw_triples, mentions, surface_map)
    ).sortWithinPartitions("subj", "pred", "obj")
