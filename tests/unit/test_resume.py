"""Resume / checkpoint / lineage tests (SURVEY.md §2 S4/S5/S7,
BASELINE.json:14 'resumable from checkpoint with per-partition lineage')."""

from __future__ import annotations

import json
import os

from canonicity_spark import pipeline
from canonicity_spark.io_catalog import ParquetCatalog


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


def test_cache_pin_scoped_release(spark):
    """pin/unpin registry: owner-scoped release, nothing leaks."""
    from canonicity_spark import cache

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
