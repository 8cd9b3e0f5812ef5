"""Benchmark runner (driver contract + BASELINE.md targets).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints exactly ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline number is the full KG pipeline (extract → link →
canonicalize → materialize) over a synthetic interleaved-span corpus
(FIXTURES.md §1 grammar) — the graded workload (BASELINE.json:2
docs/sec). The remaining queries cover the heavy relational operators
and the training-data ops at the same scale factor.

Scaling evidence (N vs 4N executors, BASELINE.json:14) is produced by
``BENCH/scaling.py``, which runs this same pipeline at local[8] and
local[32] and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from canonicity_spark import fixtures, pipeline, session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
BENCH_CORPUS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", "data", f"docs_{N_BENCH_DOCS}"
)


def _ensure_corpus() -> str:
    if not os.path.exists(os.path.join(BENCH_CORPUS, "documents.parquet")):
        fixtures.generate(BENCH_CORPUS, n_docs=N_BENCH_DOCS, seed=42)
    return BENCH_CORPUS


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
    corpus = _ensure_corpus()
    spark = session.build(
        app_name="canonicity-bench", master=f"local[{CPUS}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr)

    # headline: full KG pipeline on the synthetic interleaved corpus
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    alias = spark.read.parquet(f"{corpus}/alias_dict.parquet")

    # untimed warmup: spin up JVM codegen + Python UDF workers on a
    # small slice so the timed runs measure the pipeline, not process
    # bootstrap (both scaling levels in BENCH/scaling.py pay bootstrap
    # equally, so it cancels there; here it would just add noise)
    warm_wd = tempfile.mkdtemp(prefix="bench_warmup_")
    warm_conf = pipeline.PipelineConf(work_dir=warm_wd, resume=False)
    pipeline.run(spark, docs.limit(500), alias, warm_conf).count()
    shutil.rmtree(warm_wd, ignore_errors=True)

    wd = tempfile.mkdtemp(prefix="bench_pipeline_")

    def run_pipeline():
        conf = pipeline.PipelineConf(work_dir=wd, resume=False)
        t = pipeline.run(spark, docs, alias, conf)
        t.count()

    timed("kg_pipeline_synth", run_pipeline)
    shutil.rmtree(wd, ignore_errors=True)

    # operator headliners on driver testdata at $SF_DIR
    for name in [
        "kg_pipeline",
        "r2_join_shuffle",
        "r8_agg_q1",
        "r13_window_rank",
        "ann_cosine_topk",
        "ta_quality",
        "u4_centroid_norm",
    ]:
        timed(name, lambda n=name: qs[n](spark, SF_DIR).count())

    # the MinHash candidate stage folded into dd_near_dup_verified in
    # the registry (driver 50-entry window); keep timing it directly
    # under the same name for round-over-round comparability
    from canonicity_spark import similarity

    timed(
        "dd_minhash_pairs",
        lambda: similarity.minhash_near_dup_pairs(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).count(),
    )

    # end-to-end corpus curation over the adversarially dup-rich
    # synthetic grammar (VERDICT round 3 #6: the flagship training-data
    # capability gets a tracked number, not a docstring comment). NEW
    # line in round 4 — it grows bench_total by design; compare
    # round-over-round per query.
    from pyspark.sql import functions as F

    from canonicity_spark import curate

    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "data")
    cur_corpus = os.path.join(data_dir, "docs_100000")
    flat_corpus = os.path.join(data_dir, "docs_100000_flat")
    if not os.path.exists(os.path.join(flat_corpus, "documents.parquet")):
        # one-time prep (untimed): flatten the interleaved fixture
        # corpus to the (doc_id, text) shape curation ingests
        if not os.path.exists(os.path.join(cur_corpus, "documents.parquet")):
            fixtures.generate_parallel(cur_corpus, n_docs=100000, seed=42, workers=8)
        inter = spark.read.parquet(f"{cur_corpus}/documents.parquet")
        inter.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == F.lit("text")),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text"),
        ).write.mode("overwrite").parquet(f"{flat_corpus}/documents.parquet")
    cdocs = spark.read.parquet(f"{flat_corpus}/documents.parquet")
    cur_wd = tempfile.mkdtemp(prefix="bench_curate_")

    def run_curate():
        conf = curate.CurationConf(work_dir=cur_wd, resume=False)
        curate.run(spark, cdocs, conf).count()

    timed("curate_100k", run_curate)
    shutil.rmtree(cur_wd, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(N_BENCH_DOCS / timings["kg_pipeline_synth"], 1)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "pipeline_docs": N_BENCH_DOCS,
                "pipeline_docs_per_sec": docs_per_sec,
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main()
