"""Shared test fixtures (SURVEY.md §5): one SparkSession, one corpus."""

from __future__ import annotations

import pytest

from canonicity_spark import fixtures, session


@pytest.fixture(scope="session")
def spark():
    s = session.build(
        app_name="canonicity-tests", master="local[4]", shuffle_partitions=8
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("corpus"))
    fixtures.generate(out, n_docs=60, seed=42)
    return out


@pytest.fixture(scope="session")
def docs(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/documents.parquet")


@pytest.fixture(scope="session")
def alias_dict(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/alias_dict.parquet")


@pytest.fixture(scope="session")
def entity_pool(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/entity_pool.parquet")
