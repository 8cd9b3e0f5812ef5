"""Document source formats (JSONL/CSV, pinned schema, malformed-row
quarantine) and their path into the pipeline."""

from __future__ import annotations

import json

import pytest

from canonicity_spark import adapter


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "web", "n_chars": 16},
        {"doc_id": 2, "text": "delta epsilon", "lang": "en", "source": "web", "n_chars": 13},
    ]
    lines = [json.dumps(r) for r in rows] + ['{"doc_id": 3, "text": "broken', ""]
    p.write_text("\n".join(lines))
    return str(p)


def test_jsonl_source_reads_pinned_schema_and_quarantines(spark, jsonl_path):
    raw = adapter.read_documents(spark, jsonl_path, fmt="jsonl")
    clean, bad = adapter.quarantine_malformed(raw)
    got = {(r.doc_id, r.text) for r in clean.collect()}
    assert got == {(1, "alpha beta gamma"), (2, "delta epsilon")}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "broken" in bad_rows[0]["_corrupt_record"]
    # pinned schema, no inference: types match the parquet testdata shape
    assert dict(clean.dtypes)["doc_id"] == "bigint"
    assert dict(clean.dtypes)["n_chars"] == "int"


def test_csv_source_reads_pinned_schema(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha beta gamma,en,web,16\n"
        "2,delta epsilon,en,web,13\n"
    )
    clean, bad = adapter.quarantine_malformed(
        adapter.read_documents(spark, str(p), fmt="csv")
    )
    assert {(r.doc_id, r.text) for r in clean.collect()} == {
        (1, "alpha beta gamma"),
        (2, "delta epsilon"),
    }
    assert bad.count() == 0


def test_jsonl_source_flows_into_pipeline(spark, jsonl_path, tmp_path):
    """A JSONL corpus runs the full KG pipeline through the same
    flat->interleaved adapter as the parquet testdata."""
    from canonicity_spark import pipeline
    from canonicity_spark.schemas import ALIAS_DICT

    clean, _ = adapter.quarantine_malformed(
        adapter.read_documents(spark, jsonl_path, fmt="jsonl")
    )
    docs = adapter.flat_to_interleaved(clean)
    alias = spark.createDataFrame([], schema=ALIAS_DICT)
    conf = pipeline.PipelineConf(work_dir=str(tmp_path / "wd"))
    triples = pipeline.run(spark, docs, alias, conf)
    # driver free-text has no grammar matches; the media spans yield
    # one hasMedia triple per doc — proves the source reached the sink
    assert triples.filter("pred = 'hasMedia'").count() == 2


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported document source"):
        adapter.read_documents(spark, "/nope", fmt="orc2")
    with pytest.raises(ValueError, match="unsupported interleaved"):
        adapter.read_interleaved_documents(spark, "/nope", fmt="csv")


def test_interleaved_jsonl_pipeline_matches_parquet(spark, docs, alias_dict, tmp_path):
    """The KG pipeline over an interleaved-span JSONL corpus produces
    byte-identical triples to the same corpus read from parquet."""
    import json as _json

    from canonicity_spark import pipeline

    rows = [
        {"doc_id": r.doc_id, "spans": [s.asDict() for s in r.spans]}
        for r in docs.collect()
    ]
    p = tmp_path / "interleaved.jsonl"
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    jdocs, bad = adapter.quarantine_malformed(
        adapter.read_interleaved_documents(spark, str(p), fmt="jsonl")
    )
    assert bad.count() == 0
    t_json = pipeline.run(
        spark, jdocs, alias_dict,
        pipeline.PipelineConf(work_dir=str(tmp_path / "wj")),
    )
    t_parq = pipeline.run(
        spark, docs, alias_dict,
        pipeline.PipelineConf(work_dir=str(tmp_path / "wp")),
    )
    assert sorted(map(tuple, t_json.collect())) == sorted(map(tuple, t_parq.collect()))


def test_quarantine_count_lands_in_stage_manifest(spark, jsonl_path, tmp_path):
    """Ingest hygiene in the drop funnel (round 4): the reader's
    quarantined-row count is recorded in the first curation stage's
    manifest and surfaces through curate.drop_funnel."""
    from canonicity_spark import curate
    from canonicity_spark.io_catalog import ParquetCatalog

    clean, bad = adapter.quarantine_malformed(
        adapter.read_documents(spark, jsonl_path, fmt="jsonl")
    )
    conf = curate.CurationConf(
        work_dir=str(tmp_path / "wd"),
        allowed_langs=None,
        min_tokens=1,
        n_quarantined=bad.count(),
    )
    out = curate.run(spark, clean, conf)
    assert out.count() == 2
    cat = ParquetCatalog(str(tmp_path / "wd"))
    assert cat.read_manifest("scored")["meta"]["quarantined"] == 1
    funnel = curate.drop_funnel(cat)
    assert funnel["quarantined"] == 1 and funnel["scored"] == 2
