"""Extraction stage (SURVEY.md §2.A S3/S6, §2.C N1–N6).

Spec: BASELINE.json:6 — "vectorized pandas/Arrow UDFs run batched
mention detection and relation/triple extraction over interleaved
text+media spans"; BASELINE.json:15 — per-row span-sequence invariant
on (kind, text, media_ref, order) and "no per-row Python".

Scale notes (10^12 docs, BASELINE.json:14):
- The whole stage is shuffle-free: explode → UDF parse → explode are
  narrow; mentions and triples are derived row-locally from the parse
  of a sentence (subject and object live in the same sentence, so no
  groupBy is needed to pair them). The only Python crossings are two
  ArrowEvalPython islands (segment, parse), batched by Arrow.
- Mention ids are content-derived (doc_id/span/sentence/offset), never
  monotonically_increasing_id — ids are stable across partitioning,
  retries, and resume (BASELINE.json:14 resumability).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType

from canonicity_spark.fixtures import MEDIA_PRED, PREDICATES
from canonicity_spark.schemas import PARSE, SENTENCE

# ---------------------------------------------------------------------------
# S3 — span explode (order-preserving) & S6 — re-assembly
# ---------------------------------------------------------------------------


def ensure_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """P5 — explicit repartitioning (BASELINE.json:6 'explicit
    repartitioning'). A small parquet input arrives as one split, which
    would serialize every pandas-UDF stage onto one core; repartition up
    to the configured shuffle width when the scan is narrower than the
    cluster. No-op (no shuffle) when the input is already wide — the
    normal case at scale, where file count >> cores."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(width, *keys) if keys else df.repartition(width)


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> (doc_id, span_idx, kind, text, media_ref, offset).

    ``posexplode`` preserves array order; ``span_idx`` is the original
    array position, which together with ``offset`` carries the order
    half of the BASELINE.json:15 invariant through the pipeline.
    """
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def reassemble_spans(exploded: DataFrame) -> DataFrame:
    """Inverse of explode_spans: re-nest spans per doc in original order.

    Sorts the collected structs by (offset, span_idx) — stable even if
    offsets tie — then strips the sort keys, restoring the exact input
    schema so the span-sequence invariant (kind, text, media_ref, order)
    can be checked with a dataframe equality.
    """
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("offset", "span_idx", "kind", "text", "media_ref")
                )
            ).alias("_sorted")
        )
        .select(
            "doc_id",
            F.transform(
                "_sorted",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


# ---------------------------------------------------------------------------
# N1 — normalization (builtin columns only; JVM-side, codegen'd)
# ---------------------------------------------------------------------------


def norm_col(c: Column) -> Column:
    """lower + trim + collapse whitespace. Mirror of fixtures.norm()."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


# ---------------------------------------------------------------------------
# N2 — sentence segmentation (scalar pandas UDF -> array<struct>)
# ---------------------------------------------------------------------------

_SENT_RE = re.compile(r"[^.]+\.")


@pandas_udf(returnType=ArrayType(SENTENCE))
def segment_sentences(texts: pd.Series) -> pd.Series:
    """text -> [(sent_id, s_text, s_begin)] — batched, pure, offset-preserving.

    Reference implementation; the pipeline hot path uses
    ``segment_sentences_expr`` (pure codegen — returning array<struct>
    of Python dicts through Arrow costs more than the segmentation
    itself). A unit test pins the two to identical output.
    """
    out = []
    for t in texts:
        if t is None:
            out.append([])
            continue
        sents = []
        for i, m in enumerate(_SENT_RE.finditer(t)):
            raw = m.group(0)
            lstrip = len(raw) - len(raw.lstrip())
            sents.append(
                {"sent_id": i, "s_text": raw.strip(), "s_begin": m.start() + lstrip}
            )
        out.append(sents)
    return pd.Series(out)


def segment_sentences_expr(text: Column) -> Column:
    """N2 as a pure column expression (JVM, whole-stage codegen) —
    exact mirror of ``segment_sentences``'s finditer(``[^.]+\\.``)
    semantics, reconstructed from a split on the 1-char terminator:

    - every non-last, non-empty piece of ``split(text, '.')`` is one
      terminated sentence (the last piece is either '' — text ended
      with '.' — or an unterminated fragment, which the reference
      finditer DROPS);
    - piece begin = cumsum(len+1) (every separator is exactly one
      '.', so offsets are exact whatever whitespace follows it:
      '. ', '.\\n', '.  ' all work);
    - s_text = ltrim(piece) + '.', s_begin advances past the leading
      whitespace — matching ``raw.strip()`` / ``m.start() + lstrip``.
    """
    pieces = F.split(text, r"\.")
    starts = F.aggregate(
        pieces,
        F.array(F.lit(0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + F.length(x) + 1)),
    )
    n = F.size(pieces)
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    def _lstrip(c: Column) -> Column:
        # F.ltrim strips only ' '; the reference lstrip() strips all
        # whitespace (\n, \t, ...)
        return F.regexp_replace(c, r"^\s+", "")

    raw = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                _lstrip(F.element_at(pieces, i + 1)).alias("t"),
                (
                    F.element_at(starts, i + 1)
                    + F.length(F.element_at(pieces, i + 1))
                    - F.length(_lstrip(F.element_at(pieces, i + 1)))
                ).alias("b"),
                F.length(F.element_at(pieces, i + 1)).alias("rawlen"),
            ),
        ),
        lambda s: s["rawlen"] > 0,
    )
    return F.transform(
        raw,
        lambda s, i: F.struct(
            i.cast("int").alias("sent_id"),
            F.concat(s["t"], F.lit(".")).alias("s_text"),
            s["b"].cast("int").alias("s_begin"),
        ),
    )


# ---------------------------------------------------------------------------
# N3/N4 — mention detection + relation parse (iterator pandas UDF).
#
# The reference behaviour is pinned by the fixture grammar
# (FIXTURES.md §1): every sentence is "<surface> <predicate-phrase>
# <surface|literal>." with a fixed 12-predicate phrase set. The parser
# is the deterministic rule-based extractor that defines ground truth
# (SURVEY.md §5). Iterator form: the compiled pattern & phrase table
# are set up once per Python worker, amortized over all batches
# (SURVEY.md §2 N3 "model/gazetteer loads once per worker").
# ---------------------------------------------------------------------------


def _build_parse_re() -> tuple[re.Pattern, dict[str, str]]:
    phrases = sorted(
        ((phrase, pred) for pred, (phrase, _t) in PREDICATES.items()),
        key=lambda x: -len(x[0]),
    )
    alt = "|".join(re.escape(p) for p, _ in phrases)
    pat = re.compile(rf"^(?P<subj>.+?)\s+(?P<phrase>{alt})\s+(?P<obj>.+?)\s*\.$")
    return pat, dict(phrases)


_NUM_RE = re.compile(r"^\d+$")


@pandas_udf(returnType=PARSE)
def parse_sentence(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """Vectorized template parse: pyarrow's RE2-backed ``extract_regex``
    does the whole Arrow batch in C++ (~10× the throughput of a Python
    re loop building row tuples). Group offsets are derived from group
    lengths — the template separates fields with single spaces, and the
    match is anchored, so subj_begin == 0 and
    obj_begin == len(subj) + len(phrase) + 2.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    pat, phrase2pred = _build_parse_re()
    for texts in batches:
        arr = pa.Array.from_pandas(texts)
        ext = pc.extract_regex(arr, pattern=pat.pattern)
        subj = ext.field("subj").to_pandas()
        phrase = ext.field("phrase").to_pandas()
        obj = ext.field("obj").to_pandas()
        matched = subj.notna()
        subj_len = subj.str.len()
        phrase_len = phrase.str.len()
        yield pd.DataFrame(
            {
                "subj_surface": subj,
                "subj_begin": subj_len.mul(0).astype("Int32"),
                "pred": phrase.map(phrase2pred),
                "obj_surface": obj,
                "obj_begin": (subj_len + phrase_len + 2).astype("Int32"),
                "obj_is_literal": obj.str.fullmatch(r"\d+")
                .map({True: 1, False: 0})
                .astype("Int32"),
            }
        )


# ---------------------------------------------------------------------------
# stage assembly
# ---------------------------------------------------------------------------


def _mention_id(doc_id: Column, span_idx: Column, sent_id: Column, begin: Column) -> Column:
    # Content-derived id (N6): deterministic under any partitioning.
    return F.concat_ws("#", doc_id, span_idx, sent_id, begin)


_PARSED_SCHEMA = (
    "doc_id string, span_idx int, sent_id int, s_text string, sent_begin int, "
    "subj_surface string, subj_begin int, pred string, "
    "obj_surface string, obj_begin int, obj_is_literal int"
)


def _parse_span_batches(batches):
    """mapInArrow kernel (U5): segmentation + template parse fused into
    one Arrow pass. All heavy ops are C++ (pyarrow split_pattern /
    list_flatten / extract_regex / utf8_length) or numpy (grouped
    cumulative offsets) — no per-row Python, no interpreted
    higher-order functions. ~5× the row throughput of the split-expr +
    scalar-UDF pipeline it replaced, and it scales linearly with cores
    (the HOF path was the serial hotspot)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    pat, phrase2pred = _build_parse_re()
    phrases = sorted(phrase2pred)
    phrase_arr = pa.array(phrases)
    pred_arr = pa.array([phrase2pred[p] for p in phrases])

    out_names = [
        "doc_id", "span_idx", "sent_id", "s_text", "sent_begin",
        "subj_surface", "subj_begin", "pred",
        "obj_surface", "obj_begin", "obj_is_literal",
    ]

    for batch in batches:
        texts = batch.column("text")
        # Segmentation mirrors segment_sentences' finditer('[^.]+\.')
        # exactly (parity-tested): split on the 1-char terminator, drop
        # each parent's LAST piece (either '' — text ended with '.' —
        # or an unterminated fragment the reference drops) and empty
        # pieces from '..' runs; sentence = ltrim(piece) + '.'. Because
        # every separator is exactly one '.', cumsum(len+1) gives exact
        # begins for any inter-sentence whitespace ('. ', '.\n', '.  ').
        pieces = pc.split_pattern(texts, pattern=".")
        flat = pc.list_flatten(pieces)
        if len(flat) == 0:
            continue
        parents = pc.list_parent_indices(pieces).to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(pieces).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype("float64")).astype("int64")
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)

        group_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        first_flat_of_parent = np.repeat(group_starts[counts > 0], counts[counts > 0])
        n = len(flat)
        idx = np.arange(n)
        pos_in_parent = idx - first_flat_of_parent
        cum = np.concatenate(([0], np.cumsum(lens + 1)))
        begin_local = cum[idx] - cum[first_flat_of_parent]

        ltrimmed = pc.utf8_ltrim_whitespace(flat)
        lstrip = lens - pc.utf8_length(ltrimmed).to_numpy(zero_copy_only=False)
        keep = (pos_in_parent != counts[parents] - 1) & (lens > 0)
        if not keep.any():
            continue
        keep_arr = pa.array(keep)
        kept_parents = parents[keep]
        s_text = pc.binary_join_element_wise(
            ltrimmed.filter(keep_arr), ".", ""
        )
        s_begin_local = (begin_local + lstrip)[keep]
        # sent_id = rank among kept sentences within the parent
        kidx = np.arange(len(kept_parents))
        new_group = np.concatenate(([True], kept_parents[1:] != kept_parents[:-1]))
        sent_id = kidx - np.maximum.accumulate(np.where(new_group, kidx, 0))

        # template parse: terminator REQUIRED (s_text always ends '.')
        ext = pc.extract_regex(s_text, pattern=pat.pattern)
        subj = ext.field("subj")
        phrase = ext.field("phrase")
        obj = ext.field("obj")
        pred = pc.take(pred_arr, pc.index_in(phrase, value_set=phrase_arr))
        subj_len = pc.utf8_length(subj)
        phrase_len = pc.utf8_length(phrase)
        obj_begin = pc.add(pc.add(subj_len, phrase_len), pa.scalar(2, pa.int32()))
        is_lit = pc.cast(
            pc.match_substring_regex(obj, r"^\d+$"), pa.int32()
        )

        span_offset = batch.column("offset").to_numpy(zero_copy_only=False)[kept_parents]
        sent_begin = (span_offset + s_begin_local).astype("int32")
        kept_parent_arr = pa.array(kept_parents)
        arrays = [
            pc.take(batch.column("doc_id"), kept_parent_arr),
            pc.take(batch.column("span_idx"), kept_parent_arr),
            pa.array(sent_id.astype("int32")),
            s_text,
            pa.array(sent_begin),
            subj,
            pc.if_else(pc.is_valid(subj), pa.scalar(0, pa.int32()), pa.scalar(None, pa.int32())),
            pred,
            obj,
            pc.cast(obj_begin, pa.int32()),
            is_lit,
        ]
        out = pa.RecordBatch.from_arrays(arrays, names=out_names)
        # Emit in bounded slices: one input batch fans out ~9 sentences
        # per doc, and a single huge Arrow IPC message both spikes JVM
        # reader memory and maximizes exposure to socket-stream stalls
        # mid-message. Slices are COMPACTED before the IPC write — a
        # zero-copy slice carries parent offsets/buffers whose IPC
        # serialization is the prime suspect in an observed
        # header/body-length desync that wedged reader and writer in
        # mutual recv.
        for lo2 in range(0, out.num_rows, 16384):
            piece = out.slice(lo2, 16384)
            yield pa.RecordBatch.from_arrays(
                [pa.concat_arrays([c]) for c in piece.columns], names=out_names
            )


def parsed_sentences(docs: DataFrame) -> DataFrame:
    """docs -> one row per parsed sentence with subject/object/pred columns."""
    spans = explode_spans(docs)
    text_spans = spans.filter(F.col("kind") == "text").select(
        "doc_id", "span_idx", "offset", "text"
    )
    parsed = text_spans.mapInArrow(_parse_span_batches, _PARSED_SCHEMA)
    return parsed.filter(F.col("pred").isNotNull())


def extract_mentions(parsed: DataFrame) -> DataFrame:
    """Mentions table (SURVEY.md §1.3): subject + non-literal object mentions.

    Subject and object mentions explode out of ONE array built per
    parsed row — a union of two branches would re-run the upstream
    Arrow parse once per branch (the parse is recomputed, not cached;
    see pipeline.run).
    """
    subj = F.struct(
        F.col("subj_surface").alias("surface"),
        (F.col("sent_begin") + F.col("subj_begin")).alias("begin"),
    )
    obj = F.struct(
        F.col("obj_surface").alias("surface"),
        (F.col("sent_begin") + F.col("obj_begin")).alias("begin"),
    )
    # No filter-HOF here: higher-order functions are CodegenFallback
    # (interpreted per row) — explode the 2-element array including the
    # null literal-object slot and drop nulls with a codegen'd Filter
    # instead (measured: the HOF made the mention derive the slowest
    # expression in the pipeline).
    pair = F.array(subj, F.when(F.col("obj_is_literal") == 0, obj))
    m = parsed.select(
        "doc_id",
        "span_idx",
        "sent_id",
        F.col("s_text").alias("context"),
        F.explode(pair).alias("_m"),
    ).filter(F.col("_m").isNotNull()).select(
        "doc_id",
        "span_idx",
        "sent_id",
        "context",
        F.col("_m.surface").alias("surface"),
        F.col("_m.begin").alias("begin"),
    )
    return m.select(
        "doc_id",
        F.col("span_idx").cast("int"),
        F.col("sent_id").cast("int"),
        _mention_id(F.col("doc_id"), F.col("span_idx"), F.col("sent_id"), F.col("begin")).alias(
            "mention_id"
        ),
        "surface",
        norm_col(F.col("surface")).alias("norm_surface"),
        F.col("begin").cast("int"),
        (F.col("begin") + F.length("surface")).cast("int").alias("end"),
        F.lit("ENT").alias("mtype"),
        "context",
    )


def extract_text_triples(parsed: DataFrame) -> DataFrame:
    """raw_triples from parsed sentences — subject/object mention ids are
    recomputed with the same content-derived formula, so no join or
    shuffle is needed to pair them (they came from the same row)."""
    subj_mid = _mention_id(
        F.col("doc_id"),
        F.col("span_idx"),
        F.col("sent_id"),
        F.col("sent_begin") + F.col("subj_begin"),
    )
    obj_mid = _mention_id(
        F.col("doc_id"),
        F.col("span_idx"),
        F.col("sent_id"),
        F.col("sent_begin") + F.col("obj_begin"),
    )
    return parsed.select(
        "doc_id",
        F.concat_ws("#", "doc_id", "span_idx", "sent_id", F.lit("t")).alias("triple_id"),
        subj_mid.alias("subj_mention_id"),
        norm_col(F.col("subj_surface")).alias("subj_norm_surface"),
        F.lit(None).cast("string").alias("subj_literal"),
        "pred",
        F.when(F.col("obj_is_literal") == 0, obj_mid).alias("obj_mention_id"),
        F.when(F.col("obj_is_literal") == 0, norm_col(F.col("obj_surface"))).alias(
            "obj_norm_surface"
        ),
        F.when(F.col("obj_is_literal") == 1, F.col("obj_surface")).alias("obj_literal"),
        F.lit(1.0).alias("conf"),
    )


def extract_media_triples(docs: DataFrame) -> DataFrame:
    """N5 — media spans -> (doc:<id>, hasMedia, media_ref) triples, plus the
    nearest preceding/following text span via lag/lead diagnostics
    (window over offset, SURVEY.md §2 R14) kept as lineage columns."""
    spans = explode_spans(docs)
    win = Window.partitionBy("doc_id").orderBy("offset")
    annotated = spans.withColumn(
        "prev_text_idx",
        F.last(F.when(F.col("kind") == "text", F.col("span_idx")), ignorenulls=True).over(
            win.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    media = annotated.filter(F.col("kind") != "text")
    return media.select(
        "doc_id",
        F.concat_ws("#", "doc_id", "span_idx", F.lit("m")).alias("triple_id"),
        F.lit(None).cast("string").alias("subj_mention_id"),
        F.lit(None).cast("string").alias("subj_norm_surface"),
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("subj_literal"),
        F.lit(MEDIA_PRED).alias("pred"),
        F.lit(None).cast("string").alias("obj_mention_id"),
        F.lit(None).cast("string").alias("obj_norm_surface"),
        F.col("media_ref").alias("obj_literal"),
        F.lit(1.0).alias("conf"),
    )


def run(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full extract stage: docs -> (mentions, raw_triples)."""
    parsed = parsed_sentences(docs)
    mentions = extract_mentions(parsed)
    triples = extract_text_triples(parsed).unionByName(extract_media_triples(docs))
    return mentions, triples
