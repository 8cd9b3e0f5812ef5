"""Unit tests for the extract stage (SURVEY.md §2 S3/S6, N1–N6)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from canonicity_spark import extract
from canonicity_spark.schemas import DOCUMENTS


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, schema=DOCUMENTS)


def test_explode_preserves_order(spark):
    docs = _mk_docs(
        spark,
        [
            (
                "d1",
                [
                    ("text", "Acme acquired Zeta.", None, 0),
                    ("image", None, "media://d1/0", 20),
                    ("text", "Zeta works for Acme.", None, 21),
                ],
            )
        ],
    )
    rows = extract.explode_spans(docs).orderBy("span_idx").collect()
    assert [r.span_idx for r in rows] == [0, 1, 2]
    assert [r.kind for r in rows] == ["text", "image", "text"]
    assert rows[1].media_ref == "media://d1/0"


def test_reassemble_roundtrip(spark, docs):
    from pyspark.testing import assertDataFrameEqual

    back = extract.reassemble_spans(extract.explode_spans(docs))
    assertDataFrameEqual(back, docs, checkRowOrder=False)


def test_segment_sentences_offsets(spark):
    df = spark.createDataFrame([("a works for b. c acquired d.",)], ["text"])
    out = df.select(F.explode(extract.segment_sentences("text")).alias("s")).collect()
    assert [r.s.sent_id for r in out] == [0, 1]
    assert out[0].s.s_text == "a works for b."
    assert out[1].s.s_begin == 15
    assert out[1].s.s_text == "c acquired d."


def test_segment_expr_matches_udf_on_corpus(spark, docs):
    """The codegen segmenter and the pandas-UDF reference implementation
    must agree on every fixture span."""
    texts = (
        extract.explode_spans(docs)
        .filter(F.col("kind") == "text")
        .select("doc_id", "span_idx", "text")
    )
    via_udf = texts.select(
        "doc_id", "span_idx", F.explode(extract.segment_sentences("text")).alias("s")
    )
    via_expr = texts.select(
        "doc_id",
        "span_idx",
        F.explode(extract.segment_sentences_expr(F.col("text"))).alias("s"),
    )
    from pyspark.testing import assertDataFrameEqual

    assertDataFrameEqual(via_expr, via_udf, checkRowOrder=False)


MESSY_TEXTS = [
    # unterminated trailing fragment containing a predicate phrase:
    # the reference finditer drops it — no extra triple
    "a works for b. c acquired d",
    # newline and multi-space inter-sentence separators
    "a works for b.\nc acquired d.",
    "a works for b.  c acquired d.",
    "a works for b.\n\n  c acquired d.",
    # period runs and whitespace-only pieces
    "a works for b.. c acquired d.",
    "a works for b. . c acquired d.",
    # no terminator at all / only a fragment
    "a works for b",
    "",
    None,
    # trailing whitespace after final period
    "a works for b. ",
    # unicode + messy separators
    "Müller Gmbh works for Žünder Aß.\n  Žünder Aß employs 42.",
]


def _messy_df(spark):
    rows = [(f"m{i}", t) for i, t in enumerate(MESSY_TEXTS)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_segment_three_way_parity_on_messy_inputs(spark):
    """UDF (reference finditer), codegen expr, and the fused Arrow
    kernel must segment messy inputs identically (ADVICE round 1):
    unterminated fragments dropped, variable-width separators exact."""
    from pyspark.testing import assertDataFrameEqual

    df = _messy_df(spark)
    via_udf = df.select(
        "doc_id", F.explode(extract.segment_sentences("text")).alias("s")
    ).select("doc_id", "s.sent_id", "s.s_text", "s.s_begin")
    via_expr = df.select(
        "doc_id", F.explode(extract.segment_sentences_expr(F.col("text"))).alias("s")
    ).select("doc_id", "s.sent_id", "s.s_text", "s.s_begin")
    docs = df.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    spans = extract.explode_spans(docs).filter(F.col("kind") == "text").select(
        "doc_id", "span_idx", "offset", "text"
    )
    via_fused = spans.mapInArrow(
        extract._parse_span_batches, extract._PARSED_SCHEMA
    ).select("doc_id", "sent_id", "s_text", F.col("sent_begin").alias("s_begin"))
    assertDataFrameEqual(via_expr, via_udf, checkRowOrder=False)
    assertDataFrameEqual(via_fused, via_udf, checkRowOrder=False)


def test_fused_parse_matches_udf_parse_on_messy_inputs(spark):
    """Triple extraction parity: the fused kernel must emit exactly the
    triples the segment-UDF + parse_sentence reference path emits —
    in particular NO triple from an unterminated trailing fragment."""
    df = _messy_df(spark)
    ref = (
        df.select("doc_id", F.explode(extract.segment_sentences("text")).alias("s"))
        .select("doc_id", "s.sent_id", extract.parse_sentence("s.s_text").alias("p"))
        .filter(F.col("p.pred").isNotNull())
        .select("doc_id", "sent_id", "p.subj_surface", "p.pred", "p.obj_surface")
    )
    docs = df.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    fused = extract.parsed_sentences(docs).select(
        "doc_id", "sent_id", "subj_surface", "pred", "obj_surface"
    )
    from pyspark.testing import assertDataFrameEqual

    assertDataFrameEqual(fused, ref, checkRowOrder=False)
    # the unterminated 'c acquired d' fragment must NOT produce a triple
    assert fused.filter(
        (F.col("doc_id") == "m0") & (F.col("pred") == "acquired")
    ).count() == 0


def test_parse_and_mentions(spark):
    docs = _mk_docs(
        spark,
        [("d1", [("text", "ACME Corp was founded by Bob Inc. acme employs 42.", None, 0)])],
    )
    parsed = extract.parsed_sentences(docs)
    rows = {r.pred: r for r in parsed.collect()}
    assert rows["founded_by"].subj_surface == "ACME Corp"
    assert rows["founded_by"].obj_surface == "Bob Inc"
    assert rows["founded_by"].obj_is_literal == 0
    assert rows["employs"].obj_surface == "42"
    assert rows["employs"].obj_is_literal == 1

    mentions = extract.extract_mentions(parsed)
    surfaces = {r.norm_surface for r in mentions.collect()}
    # literal object ("42") is not a mention
    assert surfaces == {"acme corp", "bob inc", "acme"}
    m = mentions.filter(F.col("surface") == "ACME Corp").first()
    assert (m.begin, m.end) == (0, 9)
    assert m.mention_id == "d1#0#0#0"


def test_unparseable_sentence_dropped(spark):
    docs = _mk_docs(spark, [("d1", [("text", "no relation pattern here.", None, 0)])])
    assert extract.parsed_sentences(docs).count() == 0


def test_media_triples(spark):
    docs = _mk_docs(
        spark,
        [
            (
                "d1",
                [
                    ("text", "a works for b.", None, 0),
                    ("image", None, "media://d1/0", 15),
                    ("video", None, "media://d1/1", 16),
                ],
            )
        ],
    )
    rows = extract.extract_media_triples(docs).orderBy("obj_literal").collect()
    assert len(rows) == 2
    assert all(r.pred == "hasMedia" and r.subj_literal == "doc:d1" for r in rows)
    assert [r.obj_literal for r in rows] == ["media://d1/0", "media://d1/1"]


def test_unicode_text_roundtrip_and_parse(spark):
    """Non-ASCII surfaces: offsets are char-based (utf8), hashing is
    byte-based — both must survive multi-byte text."""
    docs = _mk_docs(
        spark,
        [
            (
                "u1",
                [
                    ("text", "Müller Gmbh works for Žünder Aß. Žünder Aß employs 42.", None, 0),
                    ("image", None, "media://u1/0", 60),
                ],
            )
        ],
    )
    parsed = extract.parsed_sentences(docs)
    rows = {r.pred: r for r in parsed.collect()}
    assert rows["works_for"].subj_surface == "Müller Gmbh"
    assert rows["works_for"].obj_surface == "Žünder Aß"
    # second sentence: char-based (not byte-based) offset
    assert rows["employs"].sent_begin == len("Müller Gmbh works for Žünder Aß. ")
    m = extract.extract_mentions(parsed)
    surfaces = {r.norm_surface for r in m.collect()}
    assert "žünder aß" in surfaces
    back = extract.reassemble_spans(extract.explode_spans(docs))
    from pyspark.testing import assertDataFrameEqual

    assertDataFrameEqual(back, docs, checkRowOrder=False)


def test_mention_ids_deterministic_across_partitioning(spark, docs):
    m1 = extract.extract_mentions(extract.parsed_sentences(docs))
    m2 = extract.extract_mentions(
        extract.parsed_sentences(docs.repartition(13, "doc_id"))
    )
    assert sorted(r.mention_id for r in m1.collect()) == sorted(
        r.mention_id for r in m2.collect()
    )
