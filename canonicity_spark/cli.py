"""Production entry point (SURVEY.md §3 EP3).

Run via spark-submit on a cluster (BASELINE.json:14):

    spark-submit --py-files canonicity_spark.zip -m canonicity_spark.cli \
        --input /path/docs --alias-dict /path/alias --work-dir /path/stages \
        --run-id r42 --resume

In the sandbox the same script runs as plain python with ``--master
local[K]`` — the substitution for executor count used by the scaling
benchmark (BENCH/scaling.py). The code path is identical to EP1:
``pipeline.run`` with the parquet stage catalog (Iceberg selected by
``--backend iceberg --catalog ... --database ...`` on a cluster with
the runtime jars).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="canonicity_spark")
    p.add_argument(
        "--mode",
        choices=["kg", "curate", "ingest"],
        default="kg",
        help="kg = full KG pipeline (default); curate = corpus-curation "
        "pipeline (gates -> dedup -> near-dup clusters, curate.py); "
        "ingest = Structured-Streaming sweep over a document directory "
        "with incremental dedup against the archive (streaming.py). "
        "INGEST CONTRACT: doc_ids must be unique across the whole "
        "stream — re-feeding a shard whose ids are already archived "
        "corrupts dedup stats (duplicate id rows fan the verify joins "
        "out); mint fresh ids (content-hash or shard-prefixed) per shard",
    )
    p.add_argument("--input", required=True, help="interleaved documents parquet")
    p.add_argument("--alias-dict", default=None, help="alias dictionary parquet (kg mode)")
    p.add_argument("--entity-pool", default=None)
    p.add_argument("--work-dir", required=True, help="stage catalog root")
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tau", type=float, default=0.6)
    p.add_argument("--no-salting", action="store_true")
    p.add_argument(
        "--m1-skew-threshold",
        type=int,
        default=None,
        help="opt-in hot-key split for the M1 surface-resolution joins: "
        "surfaces with more triple rows than this are broadcast-joined "
        "separately (skew.hot_key_join). Use on celebrity-skewed corpora "
        "whose surface vocabulary exceeds the broadcast threshold; "
        "output is identical either way",
    )
    p.add_argument("--master", default=None, help="sandbox only; omit under spark-submit")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--warmup",
        action="store_true",
        help="run a 1000-doc throwaway pipeline first so the timed run "
        "measures steady-state throughput, not JVM/Python-worker bootstrap",
    )
    # curate-mode knobs
    p.add_argument("--input-format", choices=["parquet", "jsonl", "csv"],
                   default="parquet",
                   help="input format, pinned schema (kg mode: interleaved "
                   "spans, parquet/jsonl; curate mode: flat text, all "
                   "three); malformed rows are quarantined, not fatal")
    p.add_argument("--allowed-langs", default="en",
                   help="csv of language codes to keep; 'all' disables the gate")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-digit-ratio", type=float, default=0.3)
    p.add_argument("--near-dup-threshold", type=float, default=0.9)
    # ingest-mode knobs
    p.add_argument("--checkpoint-dir", default=None,
                   help="Structured-Streaming checkpoint location "
                   "(required in ingest mode; reuse it across sweeps "
                   "for exactly-once file processing)")
    p.add_argument("--compact-after", type=int, default=None,
                   help="ingest mode: fold the archive's batch stages "
                   "into a base whenever at least this many live "
                   "batches exist — checked from INSIDE every "
                   "micro-batch (so a continuously-running stream "
                   "compacts too, VERDICT round 5 #5) and once more "
                   "after the sweep. Size-tiered: small bases cascade "
                   "into the fold, bases dwarfing it survive untouched")
    args = p.parse_args(argv)
    if args.mode == "kg" and not args.alias_dict:
        p.error("--alias-dict is required in kg mode")
    if args.mode == "ingest" and not args.checkpoint_dir:
        p.error("--checkpoint-dir is required in ingest mode")

    from canonicity_spark import pipeline, session

    spark = session.build(
        app_name="canonicity-pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "ingest":
        from canonicity_spark import streaming
        from canonicity_spark.io_catalog import ParquetCatalog

        conf = streaming.StreamConf(
            work_dir=args.work_dir,
            fmt=args.input_format,
            allowed_langs=(
                None if args.allowed_langs == "all"
                else tuple(args.allowed_langs.split(","))
            ),
            min_tokens=args.min_tokens,
            max_digit_ratio=args.max_digit_ratio,
            near_dup_threshold=args.near_dup_threshold,
            compact_every=args.compact_after,
        )
        t0 = time.perf_counter()
        q = streaming.run_ingest_stream(
            spark, args.input, conf, args.checkpoint_dir
        )
        q.awaitTermination()
        compacted = None
        if args.compact_after is not None:
            compacted = streaming.compact_archive(
                spark, conf, min_batches=args.compact_after
            )
        bases, live = streaming.archive_parts(ParquetCatalog(args.work_dir))
        print(
            json.dumps(
                {
                    "mode": "ingest",
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    "batches": conf.batch_stats,
                    "archive_bases": bases,
                    "archive_live_batches": live,
                    "compacted": compacted,
                    "master": args.master or "submit-provided",
                }
            )
        )
        sys.stdout.flush()
        return

    if args.mode == "curate":
        from canonicity_spark import adapter, curate
        from canonicity_spark.io_catalog import ParquetCatalog

        docs = adapter.read_documents(spark, args.input, fmt=args.input_format)
        docs, quarantined = adapter.quarantine_malformed(docs)
        n_quarantined = quarantined.count() if args.input_format != "parquet" else 0
        conf = curate.CurationConf(
            work_dir=args.work_dir,
            run_id=args.run_id,
            allowed_langs=(
                None if args.allowed_langs == "all"
                else tuple(args.allowed_langs.split(","))
            ),
            min_tokens=args.min_tokens,
            max_digit_ratio=args.max_digit_ratio,
            near_dup_threshold=args.near_dup_threshold,
            n_quarantined=n_quarantined,
            resume=args.resume,
        )
        n_docs = docs.count()
        t0 = time.perf_counter()
        curated = curate.run(spark, docs, conf)
        n_curated = curated.count()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "mode": "curate",
                    "n_docs": n_docs,
                    "n_quarantined": n_quarantined,
                    "n_curated": n_curated,
                    "wall_sec": round(wall, 3),
                    "docs_per_sec": round(n_docs / wall, 1),
                    "stages_run": conf.stages_run,
                    "stage_wall": conf.stage_wall,
                    "funnel": curate.drop_funnel(ParquetCatalog(args.work_dir)),
                    "master": args.master or "submit-provided",
                }
            )
        )
        sys.stdout.flush()
        return

    from canonicity_spark import adapter

    docs, _bad = adapter.quarantine_malformed(
        adapter.read_interleaved_documents(spark, args.input, fmt=args.input_format)
    )
    alias = spark.read.parquet(args.alias_dict)
    pool = spark.read.parquet(args.entity_pool) if args.entity_pool else None

    if args.warmup:
        import shutil
        import tempfile

        warm_dir = tempfile.mkdtemp(prefix="cli_warmup_")
        warm_conf = pipeline.PipelineConf(work_dir=warm_dir, resume=False)
        pipeline.run(spark, docs.limit(1000), alias, warm_conf).count()
        shutil.rmtree(warm_dir, ignore_errors=True)

    n_docs = docs.count()
    conf = pipeline.PipelineConf(
        work_dir=args.work_dir,
        run_id=args.run_id,
        tau=args.tau,
        use_salting=not args.no_salting,
        m1_skew_threshold=args.m1_skew_threshold,
        resume=args.resume,
    )
    t0 = time.perf_counter()
    triples = pipeline.run(spark, docs, alias, conf, entity_pool=pool)
    n_triples = triples.count()
    wall = time.perf_counter() - t0

    from canonicity_spark import metrics

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_triples": n_triples,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1),
                "stages_run": conf.stages_run,
                "stage_wall": conf.stage_wall,
                **metrics.throughput_report(conf.stage_wall, n_docs),
                "master": args.master or "submit-provided",
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
