"""Resume / checkpoint / lineage tests (SURVEY.md §2 S4/S5/S7,
BASELINE.json:14 'resumable from checkpoint with per-partition lineage')."""

from __future__ import annotations

import json
import os

import pytest

from canonicity_spark import pipeline
from canonicity_spark.io_catalog import ParquetCatalog, StageCatalog


class _FakeIcebergBackend(StageCatalog):
    """Iceberg STORAGE semantics without jars (VERDICT round 2 #4):
    non-atomic data materialization (createOrReplace stand-in), lineage
    from per-file record counts (the ``.files`` metadata stand-in), and
    the manifest committed via an atomic property-map swap (the
    SET TBLPROPERTIES stand-in). Everything else — observe cross-check,
    fingerprint validation, commit-marker semantics — is the SHARED
    ``StageCatalog`` protocol code that the real IcebergCatalog
    inherits, so these tests exercise the exact resume-safety logic
    that runs on a real cluster."""

    def __init__(self, root, run_id=None, fingerprint=None, props=None):
        super().__init__(run_id=run_id, fingerprint=fingerprint)
        self.root = root
        os.makedirs(root, exist_ok=True)
        # the "table properties" store, shared across catalog instances
        # like a real metastore
        self.props = props if props is not None else {}
        self.fail_before_commit = False

    def _dir(self, name):
        return os.path.join(self.root, name)

    def _materialize(self, df, name, bloom_filter=None):
        # layout hints (bloom_filter, partition_by) are optimizations a
        # backend may ignore — this fake does, like the base fallback
        df.write.mode("overwrite").parquet(self._dir(name))

    def _read(self, spark, name):
        return spark.read.parquet(self._dir(name))

    def _partition_lineage(self, name, written):
        import pyarrow.parquet as pq

        path = self._dir(name)
        return [
            {
                "partition_id": i,
                "rows_out": pq.ParquetFile(os.path.join(path, n)).metadata.num_rows,
            }
            for i, n in enumerate(sorted(os.listdir(path)))
            if n.startswith("part-") and n.endswith(".parquet")
        ]

    def _commit_manifest(self, name, manifest):
        if self.fail_before_commit:
            raise RuntimeError("killed before the property swap")
        self.props[name] = json.dumps(manifest)  # atomic swap

    def _read_manifest_or_none(self, name):
        return json.loads(self.props[name]) if name in self.props else None

    def _stage_names(self):
        return list(self.props)


def test_atomic_commit_manifest(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path), run_id="r1")
    df = spark.range(100).withColumnRenamed("id", "x")
    assert not cat.stage_committed("s1")
    cat.write_stage(df, "s1", rows_in=100)
    assert cat.stage_committed("s1")
    m = cat.read_manifest("s1")
    assert m["rows_out"] == 100 and m["run_id"] == "r1"
    assert sum(p["rows_out"] for p in m["partitions"]) == 100
    assert cat.read_stage(spark, "s1").count() == 100


def test_uncommitted_stage_recomputes(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path))
    df = spark.range(10)
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "s2"))
    # data written but no manifest -> killed mid-stage -> not committed
    assert not cat.stage_committed("s2")


def test_kill_and_resume_byte_identical(spark, docs, alias_dict, tmp_path):
    wd_killed = str(tmp_path / "killed")
    wd_clean = str(tmp_path / "clean")

    # run 1: killed after linking
    c1 = pipeline.PipelineConf(work_dir=wd_killed, stop_after="surface_links")
    assert pipeline.run(spark, docs, alias_dict, c1) is None
    assert c1.stages_run == ["parsed", "mentions", "raw_triples", "surface_links"]

    # run 2: resume — must only compute the remaining stages
    c2 = pipeline.PipelineConf(work_dir=wd_killed)
    t_resumed = pipeline.run(spark, docs, alias_dict, c2)
    assert c2.stages_run == ["labels", "surface_map", "triples", "entities"]

    # uninterrupted run for comparison
    c3 = pipeline.PipelineConf(work_dir=wd_clean)
    t_clean = pipeline.run(spark, docs, alias_dict, c3)

    got = sorted(map(tuple, t_resumed.collect()))
    want = sorted(map(tuple, t_clean.collect()))
    assert got == want


def test_resume_rejects_different_input(spark, docs, alias_dict, tmp_path):
    """A work dir committed for one input/config must not silently
    donate stages to a run with a different one (ADVICE round 1) —
    stage_committed fails loudly on fingerprint mismatch."""
    import pytest

    wd = str(tmp_path / "fp")
    c1 = pipeline.PipelineConf(work_dir=wd, stop_after="mentions")
    pipeline.run(spark, docs, alias_dict, c1)

    # same input, different tau -> different fingerprint -> refuse
    c2 = pipeline.PipelineConf(work_dir=wd, tau=0.9)
    with pytest.raises(RuntimeError, match="refusing to resume"):
        pipeline.run(spark, docs, alias_dict, c2)

    # same input and config -> resumes fine
    c3 = pipeline.PipelineConf(work_dir=wd)
    assert pipeline.run(spark, docs, alias_dict, c3) is not None
    assert "mentions" not in c3.stages_run


def test_legacy_manifest_without_fingerprint_still_resumes(spark, tmp_path):
    """Manifests written before fingerprints (or by bare catalogs)
    carry fingerprint=None and stay resumable."""
    wd = str(tmp_path / "legacy")
    bare = ParquetCatalog(wd, run_id="r0")  # no fingerprint recorded
    bare.write_stage(spark.range(5), "s1")
    checked = ParquetCatalog(wd, run_id="r1", fingerprint="abc123")
    assert checked.stage_committed("s1")


def test_iceberg_protocol_commit_and_resume(spark, tmp_path):
    """The shared protocol holds behind Iceberg storage semantics:
    commit marker = atomic property swap, uncommitted data recomputes,
    fingerprint mismatch refuses resume."""
    props: dict = {}
    cat = _FakeIcebergBackend(str(tmp_path), run_id="i1", fingerprint="fpA", props=props)
    df = spark.range(100).withColumnRenamed("id", "x")

    # killed AFTER the data write but BEFORE the property commit:
    # data exists, stage is NOT committed (Iceberg's createOrReplace
    # will overwrite the orphan on retry)
    cat.fail_before_commit = True
    with pytest.raises(RuntimeError, match="property swap"):
        cat.write_stage(df, "s1")
    assert os.path.exists(os.path.join(str(tmp_path), "s1"))
    assert not cat.stage_committed("s1")

    # retry commits; a NEW catalog instance over the same property
    # store (fresh driver, same metastore) sees it committed
    cat.fail_before_commit = False
    cat.write_stage(df, "s1", rows_in=100)
    resumed = _FakeIcebergBackend(
        str(tmp_path), run_id="i2", fingerprint="fpA", props=props
    )
    assert resumed.stage_committed("s1")
    m = resumed.read_manifest("s1")
    assert m["rows_out"] == 100 and m["fingerprint"] == "fpA"
    assert sum(p["rows_out"] for p in m["partitions"]) == 100
    assert resumed.read_stage(spark, "s1").count() == 100
    assert {r.stage for r in resumed.lineage(spark).collect()} == {"s1"}

    # different input/config fingerprint -> loud refusal, same message
    # contract as the parquet backend
    other = _FakeIcebergBackend(
        str(tmp_path), run_id="i3", fingerprint="fpB", props=props
    )
    with pytest.raises(RuntimeError, match="refusing to resume"):
        other.stage_committed("s1")


def test_pipeline_kill_resume_on_iceberg_backend(spark, docs, alias_dict, tmp_path):
    """Full pipeline kill/resume THROUGH the fake Iceberg backend
    (catalog_factory) produces the same triples as the parquet backend
    — the resume-safety guarantees survive the backend switch."""
    props: dict = {}

    def factory(conf, fingerprint):
        return _FakeIcebergBackend(
            conf.work_dir, run_id=conf.run_id, fingerprint=fingerprint, props=props
        )

    wd = str(tmp_path / "ice")
    c1 = pipeline.PipelineConf(
        work_dir=wd, stop_after="surface_links", catalog_factory=factory
    )
    assert pipeline.run(spark, docs, alias_dict, c1) is None
    c2 = pipeline.PipelineConf(work_dir=wd, catalog_factory=factory)
    t_ice = pipeline.run(spark, docs, alias_dict, c2)
    assert c2.stages_run == ["labels", "surface_map", "triples", "entities"]

    c3 = pipeline.PipelineConf(work_dir=str(tmp_path / "pq"))
    t_pq = pipeline.run(spark, docs, alias_dict, c3)
    assert sorted(map(tuple, t_ice.collect())) == sorted(map(tuple, t_pq.collect()))


def test_stage_release_is_scoped_to_stage_pins(spark, docs, alias_dict, tmp_path):
    """A pin owned by an unrelated operator survives a pipeline stage
    (ADVICE round 2: the unscoped unpin_all defeated owner scoping)."""
    from canonicity_spark import cache

    bystander = cache.pin(spark.range(7), owner="unrelated_op")
    try:
        conf = pipeline.PipelineConf(work_dir=str(tmp_path / "scoped"))
        pipeline.run(spark, docs, alias_dict, conf)
        assert bystander.storageLevel.useMemory, (
            "pipeline stage release must not strip other owners' pins"
        )
    finally:
        cache.unpin_all(owner="unrelated_op")


def test_cache_pin_scoped_release(spark):
    """pin/unpin registry: owner-scoped release, nothing leaks."""
    from canonicity_spark import cache

    # earlier tests legitimately leave op-owned pins registered (they
    # release at the op's NEXT invocation; pipeline stages now release
    # only their own) — drain so the counts below are exact
    cache.unpin_all()
    a = cache.pin(spark.range(10), owner="x")
    b = cache.pin(spark.range(20), owner="y")
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    assert cache.unpin_all(owner="x") == 1
    assert not a.storageLevel.useMemory
    assert b.storageLevel.useMemory
    assert cache.unpin_all() == 1
    assert not b.storageLevel.useMemory


def test_lineage_table(spark, docs, alias_dict, tmp_path):
    wd = str(tmp_path / "lin")
    conf = pipeline.PipelineConf(work_dir=wd)
    pipeline.run(spark, docs, alias_dict, conf)
    cat = ParquetCatalog(wd)
    lin = cat.lineage(spark)
    stages = {r.stage for r in lin.collect()}
    assert stages == set(pipeline.STAGES)
    # per-stage totals must match the manifests
    mrows = json.load(open(os.path.join(wd, "triples", "_COMMIT.json")))["rows_out"]
    lrows = (
        lin.filter(lin.stage == "triples")
        .groupBy("stage")
        .sum("rows_out")
        .collect()[0][1]
    )
    assert mrows == lrows
