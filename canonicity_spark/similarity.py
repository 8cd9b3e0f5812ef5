"""Similarity & dedup operators over embeddings and documents.

Scale-path pieces for a training-data pipeline: brute-force cosine
top-k as the correctness baseline, LSH-bucketed candidate generation
(reusing the linker's MinHash machinery) as the 100-TB path, and
SimHash for near-dup text detection.

All-pairs scans are never materialized: candidate pairs only exist
inside shared LSH buckets, and the brute-force top-k broadcasts the
(tiny) query side.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType

from canonicity_spark.link import minhash_band_hashes, shingles_col


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against one stored vector.

    The query row is broadcast (1 row), the scan is a single narrow
    pass over the embeddings — the right baseline even at 100 TB since
    it's embarrassingly parallel; the LSH variant below is the
    candidate-pruned path. All arithmetic in double, JVM-side
    (zip_with/aggregate higher-order functions — no UDF).
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    joined = embeddings.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    dot = _dot(F.col("embedding"), F.col("q_emb"))
    n1 = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    n2 = F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
    scored = joined.select(
        "vec_id", F.round(dot / (n1 * n2), 6).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)


@pandas_udf(returnType=LongType())
def simhash64(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """64-bit SimHash over whitespace tokens (crc32-seeded, process-
    stable). Vectorized per Arrow batch; near-dups differ in few bits."""
    for texts in batches:
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in t.split():
                data = tok.encode("utf-8")
                h = np.uint64((zlib.crc32(data) << 32) | zlib.crc32(data, 0xABCD))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == np.uint64(1), 1, -1)
            sig = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
        yield pd.Series(out, dtype="int64")


def simhash_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", simhash64(F.col(text_col)).alias("simhash"))


def minhash_near_dup_pairs(
    docs: DataFrame, text_col: str = "text", max_bucket: int = 200
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs over document text.

    shingle → minhash → band → bucket self-join (the linker's fused
    band-hash UDF, word-level 3-shingles via char shingles of the
    normalized text). Buckets above max_bucket are dropped — at corpus
    scale a degenerate bucket (empty docs, boilerplate) would produce
    a quadratic pair explosion; the cap is the skew guard.
    Returns distinct (doc_a < doc_b) candidate pairs with their
    n-gram jaccard similarity computed JVM-side.
    """
    normed = F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")
    banded = (
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), normed.alias("_t"))
        .withColumn("_bands", minhash_band_hashes(shingles_col(F.col("_t"), 5)))
        .select("doc_id", "_t", F.posexplode("_bands").alias("band_id", "band_hash"))
    )
    w = Window.partitionBy("band_id", "band_hash")
    banded = banded.withColumn("_bsz", F.count("*").over(w)).filter(
        F.col("_bsz") <= max_bucket
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("_t").alias("text_a"), "band_id", "band_hash"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("_t").alias("text_b"), "band_id", "band_hash"
    )
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    s1 = shingles_col(F.col("text_a"), 5)
    s2 = shingles_col(F.col("text_b"), 5)
    jac = F.size(F.array_intersect(s1, s2)) / F.size(F.array_union(s1, s2))
    return pairs.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.8
) -> DataFrame:
    """Near-dups above a jaccard threshold: LSH candidates filtered by
    exact n-gram jaccard (verification step of the dedup pipeline)."""
    return minhash_near_dup_pairs(docs, text_col).filter(
        F.col("jaccard") >= threshold
    )
