"""Flat→interleaved adapter (FIXTURES.md §5).

The driver's testdata ``documents`` table is flat
(doc_id:int64, text, lang, source, n_chars); the pipeline input schema
is the interleaved-span table pinned by BASELINE.json:15. The adapter
builds one text span plus one synthetic media span per doc as a pure
column expression (no UDF, no shuffle) so driver data can exercise the
full pipeline including kind routing and the span-order invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
