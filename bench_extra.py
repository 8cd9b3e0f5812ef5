"""Round-8 companion benchmarks (bench.py is measurement-frozen).

Adds what VERDICT round 7 asked of the bench artifact without touching
the frozen harness:

1. **Same-session load controls** (VERDICT r7 #1): a fixed pure-CPU
   control (numpy hash loop — no Spark, no IO) and one untouched Spark
   control query (r8_agg_q1), both measured BEFORE and AFTER every
   timed block. Their walls + a drift ratio land in the JSON so a
   reader can tell ambient sandbox load from an engine change: this
   host's load average is driven by neighbors (CLAUDE.md "ambient
   sandbox load varies round to round"), and round 7's bench artifact
   was uninterpretable without exactly this.
2. **near_pairs decomposition**: noop-sink walls for the dedup
   sub-stages (banding, candidate join+dedup, verify) on the 100k
   curate corpus — the guide §1.4 isolation bench.py's stage walls
   cannot provide.
3. **cc_distributed chain evidence** (VERDICT r7 #3): the pointer-
   doubling kernel on a diameter-512 chain — rounds must stay
   O(log d); bench.py's star-graph line cannot show the asymptotics.

Usage: python bench_extra.py   (prints one JSON line, like bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_IDLE_TIMEOUT", "60")

import numpy as np  # noqa: E402

from canonicity_spark import cache, canonicalize, session, similarity  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
FLAT_CORPUS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "BENCH", "data", "docs_100000_flat", "documents.parquet",
)


def cpu_control() -> float:
    """Fixed pure-CPU control: single-thread numpy hashing — immune to
    Spark, IO and the JVM; only host CPU contention moves it."""
    t0 = time.perf_counter()
    rng = np.random.RandomState(0)
    x = rng.randint(0, 1 << 62, size=2_000_000, dtype=np.int64)
    for _ in range(20):
        x = (x * np.int64(6364136223846793005) + np.int64(1442695040888963407))
        x ^= x >> np.int64(17)
    assert int(x[0]) is not None
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    import __spark_entry__ as em

    from pyspark.sql import functions as F

    spark = session.build(app_name="canonicity-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    def spark_control() -> float:
        t0 = time.perf_counter()
        qs["r8_agg_q1"](spark, SF_DIR).count()
        return round(time.perf_counter() - t0, 3)

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm JVM codegen + Python workers before any timed block
    docs01 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    similarity.minhash_near_dup_pairs(docs01.limit(500)).count()
    cache.unpin_all(owner="minhash_dedup")
    spark_control()

    controls_before = {"cpu": cpu_control(), "spark_r8": spark_control()}

    # -- near_pairs decomposition on the 100k curate corpus ------------
    docs = spark.read.parquet(FLAT_CORPUS).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    fp = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    winners = (
        docs.select("doc_id", fp.alias("_fp"))
        .groupBy("_fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    ek = docs.join(winners, "doc_id", "left_semi")

    decomp: dict[str, list[float]] = {
        "banding": [], "pairs": [], "verify_e2e": [], "near_pairs_e2e": []
    }
    for _rep in range(REPS):
        spark.sparkContext.setJobDescription("bench_extra: banding")
        base, banded = similarity._banded_docs(ek, "text")
        banded = cache.pin(banded, owner="bx")
        decomp["banding"].append(noop(banded))
        spark.sparkContext.setJobDescription("bench_extra: candidate pairs")
        hot = (
            banded.groupBy("band_id", "band_hash").agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") > 200).select("band_id", "band_hash")
        )
        g = banded.join(F.broadcast(hot), ["band_id", "band_hash"], "left_anti")
        a = g.select(F.col("doc_id").alias("doc_a"), "band_id", "band_hash")
        b = g.select(F.col("doc_id").alias("doc_b"), "band_id", "band_hash")
        pairs = (
            a.join(b, ["band_id", "band_hash"]).filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").dropDuplicates(["doc_a", "doc_b"])
        )
        decomp["pairs"].append(noop(pairs))
        spark.sparkContext.setJobDescription("bench_extra: verify")
        decomp["verify_e2e"].append(
            noop(similarity._verify_pairs_jaccard(pairs, base, owner="bx",
                                                  min_jaccard=0.9))
        )
        cache.unpin_all(owner="bx")
        cache.unpin_all(owner="minhash_dedup")
        spark.sparkContext.setJobDescription("bench_extra: near_pairs e2e")
        decomp["near_pairs_e2e"].append(
            noop(similarity.ngram_jaccard_pairs(ek, threshold=0.9))
        )
        cache.unpin_all(owner="minhash_dedup")
        spark.sparkContext.setJobDescription(None)

    # -- cc chain (pointer-doubling asymptotics) -----------------------
    d = 512
    chain = spark.range(d).select(
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 5, "0")).alias("src"),
        F.concat(F.lit("c"), F.lpad((F.col("id") + 1).cast("string"), 5, "0")).alias("dst"),
    )
    cc_stats: dict = {}
    t0 = time.perf_counter()
    canonicalize.connected_components(
        chain, max_iter=40, driver_max_edges=0, stats=cc_stats
    ).count()
    cc_chain = {
        "diameter": d,
        "rounds": cc_stats.get("rounds"),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }

    controls_after = {"cpu": cpu_control(), "spark_r8": spark_control()}
    drift = round(
        max(controls_after["cpu"] / controls_before["cpu"],
            controls_before["cpu"] / controls_after["cpu"]), 3
    )

    print(json.dumps({
        "metric": "bench_extra",
        "unit": "sec",
        "sf_dir": SF_DIR,
        "controls_before": controls_before,
        "controls_after": controls_after,
        "cpu_control_drift": drift,
        "load_flag": drift > 1.2,
        "near_pairs_decomposition": decomp,
        "cc_chain": cc_chain,
        "reps": REPS,
        "cpus": int(CPUS),
    }))


if __name__ == "__main__":
    main()
