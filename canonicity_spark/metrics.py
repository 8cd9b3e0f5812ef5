"""In-flight metrics (SURVEY.md §2 S7).

``observe()`` attaches named aggregates to a DataFrame that are
collected as a side effect of the action that materializes it — rows
and checksums come back with the write itself, costing zero extra
jobs (unlike a count(), which would re-run the plan). The per-partition
breakdown comes from parquet footers at commit time
(io_catalog._partition_lineage); this module covers the in-flight
totals and the stage timing report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach row/null-key observation to a stage output. Read
    ``obs.get`` only after an action has materialized the DataFrame."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def throughput_report(stage_wall: dict[str, float], n_docs: int) -> dict:
    """docs/sec per stage + total, for the cli metrics line."""
    total = sum(stage_wall.values())
    return {
        "total_stage_sec": round(total, 3),
        "docs_per_sec_stages": round(n_docs / total, 1) if total else None,
        "stage_share": {
            k: round(v / total, 3) for k, v in stage_wall.items()
        } if total else {},
    }
