"""Document sources + flat→interleaved adapter (FIXTURES.md §5).

The driver's testdata ``documents`` table is flat
(doc_id:int64, text, lang, source, n_chars); the pipeline input schema
is the interleaved-span table pinned by BASELINE.json:15. The adapter
builds one text span plus one synthetic media span per doc as a pure
column expression (no UDF, no shuffle) so driver data can exercise the
full pipeline including kind routing and the span-order invariant.

``read_documents`` adds source-format breadth: real corpora arrive as
JSONL or CSV at least as often as parquet. Schemas are PINNED, never
inferred — ``inferSchema``/sampled JSON inference is an extra full (or
sampled) scan of the input and a nondeterminism source at 100 TB; a
malformed row lands as nulls in PERMISSIVE mode with the raw record in
``_corrupt_record`` for routing, instead of failing the ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the flat documents schema (driver testdata shape), pinned for
# schema-on-read sources; _corrupt_record catches malformed JSON/CSV
# rows for quarantine routing instead of job failure
FLAT_DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars int, "
    "_corrupt_record string"
)

# the pipeline's interleaved-span input shape (BASELINE.json:15) for
# schema-on-read sources — nested structs parse fine from JSONL with a
# declared schema, no inference scan
INTERLEAVED_DOCUMENTS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "_corrupt_record string"
)


def read_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a flat documents table from parquet / jsonl / csv with the
    pinned schema. Malformed rows (jsonl/csv) come back with doc_id
    null and the raw line in ``_corrupt_record`` — callers quarantine
    via ``quarantine_malformed``. Column pruning and (for parquet)
    predicate pushdown work as usual because the schema is declared,
    not inferred."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "jsonl":
        return spark.read.schema(FLAT_DOCUMENTS_SCHEMA).option(
            "mode", "PERMISSIVE"
        ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    if fmt == "csv":
        return (
            spark.read.schema(FLAT_DOCUMENTS_SCHEMA)
            .option("header", True)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path)
        )
    raise ValueError(f"unsupported document source format: {fmt!r}")


def read_interleaved_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read the INTERLEAVED-span documents table (the KG pipeline's
    input shape) from parquet or JSONL. Nested spans parse from JSONL
    against the pinned schema — same quarantine contract as the flat
    reader (CSV cannot carry the nested spans column and is rejected)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "jsonl":
        return spark.read.schema(INTERLEAVED_DOCUMENTS_SCHEMA).option(
            "mode", "PERMISSIVE"
        ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    raise ValueError(f"unsupported interleaved source format: {fmt!r}")


def quarantine_malformed(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a schema-on-read frame into (clean, quarantined). Clean
    rows drop the corrupt-record column; quarantined rows keep the raw
    record for offline inspection — at ingest scale a bad line must
    cost a lineage counter, never a failed stage.

    Quarantine = corrupt-record set OR doc_id null: an id-less row is
    unusable downstream regardless of parse status, and referencing a
    data column alongside the corrupt column sidesteps Spark's
    corrupt-record-only query restriction on raw CSV/JSON scans
    (SPARK-21610) without the documented cache() workaround — caching
    an ingest-scale frame to count its bad rows would be absurd."""
    if "_corrupt_record" not in docs.columns:
        return docs, docs.limit(0)
    is_bad = malformed_predicate(docs)
    bad = docs.filter(is_bad)
    clean = docs.filter(~is_bad).drop("_corrupt_record")
    return clean, bad


def malformed_predicate(docs: DataFrame) -> F.Column:
    """The quarantine predicate as a reusable Column (False-literal when
    the frame has no corrupt-record column), so callers can fold the
    quarantined count into an existing aggregate instead of paying a
    second count() job (streaming.process_batch)."""
    if "_corrupt_record" not in docs.columns:
        return F.lit(False)
    return F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull()


def flat_to_interleaved(flat_docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id").cast("string")
    text_span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    media_span = F.struct(
        F.lit("image").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("media://"), doc_id).alias("media_ref"),
        F.col("n_chars").cast("int").alias("offset"),
    )
    return flat_docs.select(
        doc_id.alias("doc_id"), F.array(text_span, media_span).alias("spans")
    )
