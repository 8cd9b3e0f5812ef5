"""Corpus-curation pipeline tests: every gate drops exactly the
planted junk class, the funnel is recorded in stage manifests, and a
killed run resumes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canonicity_spark import curate
from canonicity_spark.io_catalog import ParquetCatalog

GOOD = (
    "the quick brown fox jumps over the lazy dog and it runs far "
    "for a long time in the cold morning air of the open field "
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # three good unique english docs (d0 also seeds dup classes)
        ("d0", GOOD + "first story variant"),
        ("d1", GOOD + "second story about the river and the old stone bridge"),
        ("d2", GOOD + "third story for the archive of it all"),
        # exact duplicates of d0 (whitespace-normalized equal)
        ("d3", GOOD + "first  story   variant"),
        ("d4", GOOD + "first story variant "),
        # near-duplicate CLUSTER: d5 ~ d1, d6 ~ d5 (transitive) — CC
        # keeps the min representative d1
        ("d5", GOOD + "second story about the river and the old stone ridge"),
        ("d6", GOOD + "second story about the river and the old tone ridge"),
        # spanish doc -> language gate
        ("d7", "el perro corre en la calle y no se detiene porque es un dia de sol en la ciudad"),
        # digit spam -> quality gate
        ("d8", "the 123456789 987654321 000111222 333444555 666777888 999000111"),
        # too short -> token gate
        ("d9", "the end"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curation_drops_each_junk_class(spark, corpus, tmp_path):
    conf = curate.CurationConf(work_dir=str(tmp_path / "cur"))
    curated = curate.run(spark, corpus, conf)
    assert {r.doc_id for r in curated.collect()} == {"d0", "d1", "d2"}
    assert conf.stages_run == curate.STAGES

    # the drop funnel comes from manifests, no recount jobs
    funnel = curate.drop_funnel(ParquetCatalog(str(tmp_path / "cur")))
    assert funnel["scored"] == 10
    assert funnel["kept"] == 7        # d7 (lang), d8 (digits), d9 (short) gone
    assert funnel["exact_kept"] == 5  # d3, d4 collapse into d0
    assert funnel["near_pairs"] >= 2  # d1~d5, d5~d6 (d1~d6 may also pair)
    assert funnel["curated"] == 3


def test_curation_resume_is_stable(spark, corpus, tmp_path):
    wd = str(tmp_path / "cur_resume")
    c1 = curate.CurationConf(work_dir=wd, stop_after="exact_kept")
    assert curate.run(spark, corpus, c1) is None
    assert c1.stages_run == ["scored", "kept", "exact_kept"]

    c2 = curate.CurationConf(work_dir=wd)
    resumed = curate.run(spark, corpus, c2)
    assert c2.stages_run == ["near_pairs", "curated"]

    c3 = curate.CurationConf(work_dir=str(tmp_path / "cur_clean"))
    clean = curate.run(spark, corpus, c3)
    assert sorted(map(tuple, resumed.collect())) == sorted(map(tuple, clean.collect()))


def test_curation_resume_rejects_different_gates(spark, corpus, tmp_path):
    """A work dir committed under one gate config must refuse to donate
    stages to a run with different thresholds (fingerprint guard, same
    contract as the KG pipeline)."""
    wd = str(tmp_path / "cur_fp")
    c1 = curate.CurationConf(work_dir=wd, stop_after="kept")
    curate.run(spark, corpus, c1)

    c2 = curate.CurationConf(work_dir=wd, min_tokens=20)
    with pytest.raises(RuntimeError, match="refusing to resume"):
        curate.run(spark, corpus, c2)

    c3 = curate.CurationConf(work_dir=wd)  # same gates -> resumes
    assert curate.run(spark, corpus, c3) is not None
    assert "kept" not in c3.stages_run


def test_cli_curate_mode(spark, corpus, tmp_path, capsys):
    """The production CLI runs curation end-to-end and reports the
    funnel (EP3 surface for the training-data pipeline)."""
    import json

    from canonicity_spark import cli

    inp = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(inp)
    cli.main(
        [
            "--mode", "curate",
            "--input", inp,
            "--work-dir", str(tmp_path / "wd"),
            "--allowed-langs", "en",
        ]
    )
    out = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert out["mode"] == "curate"
    assert out["n_docs"] == 10 and out["n_curated"] == 3
    assert out["funnel"]["curated"] == 3


def test_cli_curate_jsonl_input(spark, corpus, tmp_path, capsys):
    """curate mode ingests a JSONL corpus (one bad line quarantined)."""
    import json as _json

    from canonicity_spark import cli

    inp = str(tmp_path / "docs.jsonl")
    lines = [
        _json.dumps({"doc_id": i, "text": r["text"]})
        for i, r in enumerate(corpus.collect())
    ] + ['{"doc_id": 99, "text": "trunc']
    open(inp, "w").write("\n".join(lines))
    cli.main(
        [
            "--mode", "curate",
            "--input", inp,
            "--input-format", "jsonl",
            "--work-dir", str(tmp_path / "wdj"),
        ]
    )
    out = _json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert out["n_quarantined"] == 1
    assert out["n_docs"] == 10 and out["n_curated"] == 3


def test_curation_empty_and_degenerate_corpora(spark, tmp_path):
    """Empty input and an all-duplicates corpus must flow through every
    stage (zero-row stage commits, empty near-dup graph, full-corpus
    dup cluster) without errors."""
    empty = spark.createDataFrame([], "doc_id string, text string")
    c_e = curate.CurationConf(work_dir=str(tmp_path / "empty"))
    assert curate.run(spark, empty, c_e).count() == 0
    assert c_e.stages_run == curate.STAGES

    dups = spark.createDataFrame(
        [(f"d{i:02d}", GOOD + "the same text in every document") for i in range(20)],
        ["doc_id", "text"],
    )
    c_d = curate.CurationConf(work_dir=str(tmp_path / "dups"))
    out = curate.run(spark, dups, c_d)
    assert [r.doc_id for r in out.collect()] == ["d00"]


def test_score_docs_matches_textops_definitions(spark, corpus):
    """score_docs fuses the three textops into one scan; its columns
    must stay equal to the standalone operators (drift guard)."""
    from canonicity_spark import textops

    got = {
        r.doc_id: (r.n_tokens, r.digit_ratio, r.pred_lang, r.pred_score)
        for r in curate.score_docs(corpus).collect()
    }
    li = {r.doc_id: (r.pred_lang, r.pred_score) for r in textops.lang_id(corpus).collect()}
    q = {r.doc_id: (r.n_tokens, r.digit_ratio) for r in textops.quality_score(corpus).collect()}
    for doc_id, (n_tokens, digit_ratio, pred_lang, pred_score) in got.items():
        assert (pred_lang, pred_score) == li[doc_id], doc_id
        assert (n_tokens, digit_ratio) == q[doc_id], doc_id


def test_curation_plan_stays_jvm_side_until_lsh(spark, corpus):
    """Scoring + gating must be pure codegen (no Python, no lambda
    HOFs) — the only Python crossing in curation is the LSH banding."""
    plan = (
        curate.score_docs(corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "lambdafunction" not in plan.lower()
