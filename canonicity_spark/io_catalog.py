"""Stage catalog: checkpointed stage tables with commit manifests
(SURVEY.md §1.5, §2.A S4/S5/S7).

Spec: BASELINE.json:6/14 — "checkpoints each stage to Iceberg with
per-partition lineage and counters so a killed run resumes from the
last committed stage".

This sandbox has no Iceberg runtime jar and no network to fetch one
(SURVEY.md §0 [ENV]), so the catalog is an interface with two
backends:

- ``ParquetCatalog`` (used everywhere here): one parquet directory per
  stage plus an atomically-renamed ``_COMMIT.json`` manifest carrying
  row counts, per-partition lineage, and the run id. A stage is
  committed iff the manifest exists — a killed run leaves no manifest
  and the stage recomputes; a committed stage is read back instead of
  recomputed (S5). The atomic ``os.rename`` is the commit point,
  mirroring Iceberg's atomic snapshot swap.
- ``IcebergCatalog``: the same interface over ``df.writeTo(...)`` +
  snapshot inspection; selected purely by config for spark-submit
  production runs (BASELINE.json:14). It cannot be exercised in this
  sandbox and is kept import-safe.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partition_lineage(path: str) -> list[dict]:
    """S7 — per-partition row counters of the materialized stage output.

    Read from the parquet footers on the driver (one output file ==
    one write partition), so lineage costs zero Spark jobs — at
    thousands of stages × partitions the read-back aggregation this
    replaces was a measurable fixed cost per stage.
    """
    import pyarrow.parquet as pq

    out = []
    for i, name in enumerate(sorted(os.listdir(path))):
        if name.startswith("part-") and name.endswith(".parquet"):
            out.append(
                {
                    "partition_id": i,
                    "rows_out": pq.ParquetFile(os.path.join(path, name)).metadata.num_rows,
                }
            )
    return out


class ParquetCatalog:
    """Parquet-backed stage store with atomic commit manifests."""

    def __init__(
        self, root: str, run_id: str | None = None, fingerprint: str | None = None
    ):
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        # input/config identity: recorded in every manifest and
        # validated on resume so a work dir left by a different
        # input/config cannot silently donate stale stages (S5 safety).
        self.fingerprint = fingerprint
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self._dir(name), "_COMMIT.json")

    # -- S4: stage sink -------------------------------------------------
    def write_stage(self, df: DataFrame, name: str, rows_in: int | None = None) -> DataFrame:
        """Write stage output + manifest; returns the re-read DataFrame
        (reading back decouples downstream stages from the upstream
        plan — same effect as a reliable checkpoint)."""
        from canonicity_spark import metrics

        path = self._dir(name)
        # S7: in-flight row counter piggybacks on the write action
        # (zero extra jobs); the footer sum cross-checks it below —
        # a mismatch means a partial/corrupt write and must not commit.
        df_obs, obs = metrics.observed(df, f"{name}-{self.run_id}-{uuid.uuid4().hex[:6]}")
        df_obs.write.mode("overwrite").parquet(path)
        observed_rows = obs.get["rows"]
        spark = df.sparkSession
        written = spark.read.parquet(path)
        lineage = _partition_lineage(path)
        rows_out = sum(p["rows_out"] for p in lineage)
        if rows_out != observed_rows:
            raise RuntimeError(
                f"stage {name}: wrote {rows_out} rows but observed "
                f"{observed_rows} in-flight — refusing to commit"
            )
        manifest = {
            "stage": name,
            "run_id": self.run_id,
            "fingerprint": self.fingerprint,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "partitions": lineage,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = self._manifest(name) + f".tmp.{self.run_id}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(tmp, self._manifest(name))  # atomic commit point
        return written

    # -- S5: resume ------------------------------------------------------
    def stage_committed(self, name: str) -> bool:
        """Committed AND written for the same input/config.

        A manifest from a different fingerprint means the work dir
        belongs to another input or configuration — fail loudly rather
        than resume into mixed stage outputs (ADVICE round 1).
        """
        if not os.path.exists(self._manifest(name)):
            return False
        if self.fingerprint is None:
            return True
        recorded = self.read_manifest(name).get("fingerprint")
        if recorded is not None and recorded != self.fingerprint:
            raise RuntimeError(
                f"stage {name!r} in {self.root} was committed for a different "
                f"input/config (manifest fingerprint {recorded}, expected "
                f"{self.fingerprint}) — refusing to resume; use a fresh "
                "work dir or delete the stale stages"
            )
        return True

    def read_stage(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._dir(name))

    def read_manifest(self, name: str) -> dict:
        with open(self._manifest(name)) as f:
            return json.load(f)

    # -- lineage table (S7) ----------------------------------------------
    def lineage(self, spark: SparkSession) -> DataFrame:
        """The _lineage table assembled from all committed manifests."""
        rows = []
        for name in sorted(os.listdir(self.root)):
            mf = self._manifest(name)
            if os.path.exists(mf):
                with open(mf) as f:
                    m = json.load(f)
                for p in m["partitions"]:
                    rows.append(
                        (
                            m["stage"],
                            p["partition_id"],
                            m.get("rows_in"),
                            p["rows_out"],
                            m["run_id"],
                            m["committed_at"],
                        )
                    )
        return spark.createDataFrame(
            rows,
            "stage string, partition_id int, rows_in long, rows_out long, "
            "run_id string, committed_at string",
        )


class IcebergCatalog:
    """Iceberg-backed variant of the same interface (production path).

    Requires iceberg-spark-runtime on the cluster classpath and a
    configured catalog (BASELINE.json:6 'materialization into
    Iceberg'). Not testable in this sandbox (no jars, no network) —
    kept import-safe and config-selected; every pipeline stage goes
    through the shared interface so switching backends is config-only.
    """

    def __init__(self, catalog: str, database: str, run_id: str | None = None):
        self.prefix = f"{catalog}.{database}"
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def _tbl(self, name: str) -> str:
        return f"{self.prefix}.{name}"

    def write_stage(self, df: DataFrame, name: str, rows_in: int | None = None) -> DataFrame:
        df.writeTo(self._tbl(name)).using("iceberg").createOrReplace()
        return df.sparkSession.table(self._tbl(name))

    def stage_committed(self, name: str) -> bool:
        spark = SparkSession.getActiveSession()
        if spark is None or not spark.catalog.tableExists(self._tbl(name)):
            return False
        snaps = spark.sql(f"SELECT * FROM {self._tbl(name)}.snapshots LIMIT 1")
        return snaps.count() > 0

    def read_stage(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(self._tbl(name))


def make_catalog(conf: dict) -> ParquetCatalog | IcebergCatalog:
    """Config-selected backend (SURVEY.md §1.5)."""
    backend = conf.get("backend", "parquet")
    if backend == "iceberg":
        return IcebergCatalog(
            conf["catalog"], conf["database"], run_id=conf.get("run_id")
        )
    return ParquetCatalog(conf["root"], run_id=conf.get("run_id"))
