"""Pipeline table schemas, declared once (SURVEY.md §1.2–1.4).

The interleaved-document input schema is pinned by BASELINE.json:15
(input_hint); derived-table schemas follow SURVEY.md §1.3. No schema
inference on pipeline tables — only driver-provided testdata parquet
(whose footers carry schemas) is read with inference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- input: interleaved documents (BASELINE.json:15) -----------------------

SPAN = StructType(
    [
        StructField("kind", StringType()),       # 'text' | 'image' | 'video' | ...
        StructField("text", StringType()),       # non-null iff kind == 'text'
        StructField("media_ref", StringType()),  # non-null iff kind != 'text'
        StructField("offset", IntegerType()),    # position; defines span order
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN)),
    ]
)

# --- side input: alias dictionary (BASELINE.json:6 "alias dictionary broadcast")

ALIAS_DICT = StructType(
    [
        StructField("alias", StringType()),      # normalized surface
        StructField("entity_id", StringType()),
        StructField("prior", DoubleType()),      # popularity prior in [0,1]
    ]
)

ENTITY_POOL = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("canonical_name", StringType()),
    ]
)

# --- derived tables (SURVEY.md §1.3) ---------------------------------------

MENTIONS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("sent_id", IntegerType()),
        StructField("mention_id", StringType()),
        StructField("surface", StringType()),
        StructField("norm_surface", StringType()),
        StructField("begin", IntegerType()),
        StructField("end", IntegerType()),
        StructField("mtype", StringType()),
        StructField("context", StringType()),
    ]
)

RAW_TRIPLES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("triple_id", StringType()),
        StructField("subj_mention_id", StringType()),
        # normalized surfaces carried from the parse (subject and object
        # come from the same sentence row, so these are free at extract
        # time and make M1 resolution a vocabulary-sized join instead of
        # a mention-scale one)
        StructField("subj_norm_surface", StringType()),
        StructField("subj_literal", StringType()),   # e.g. 'doc:<id>' for media triples
        StructField("pred", StringType()),
        StructField("obj_mention_id", StringType()),
        StructField("obj_norm_surface", StringType()),
        StructField("obj_literal", StringType()),
        StructField("conf", DoubleType()),
    ]
)

CANDIDATES = StructType(
    [
        StructField("norm_surface", StringType()),
        StructField("cand_entity_id", StringType()),
        StructField("gen_source", StringType()),  # 'alias' | 'lsh'
        StructField("prior", DoubleType()),
    ]
)

SCORED_LINKS = StructType(
    [
        StructField("norm_surface", StringType()),
        StructField("entity_id", StringType()),
        StructField("score", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)

EDGES = StructType(
    [
        StructField("src", StringType()),
        StructField("dst", StringType()),
        StructField("w", DoubleType()),
        StructField("etype", StringType()),
    ]
)

LABELS = StructType(
    [
        StructField("node", StringType()),
        StructField("label", StringType()),
    ]
)

ENTITIES = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("canonical_name", StringType()),
        StructField("aliases", ArrayType(StringType())),
        StructField("n_mentions", LongType()),
    ]
)

TRIPLES = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("conf", DoubleType()),
        StructField("n_support", LongType()),
    ]
)

# sentence struct returned by the segmentation UDF (SURVEY.md §2 N2)
SENTENCE = StructType(
    [
        StructField("sent_id", IntegerType()),
        StructField("s_text", StringType()),
        StructField("s_begin", IntegerType()),
    ]
)

# parse struct returned by the mention/relation UDF (SURVEY.md §2 N3/N4)
PARSE = StructType(
    [
        StructField("subj_surface", StringType()),
        StructField("subj_begin", IntegerType()),
        StructField("pred", StringType()),
        StructField("obj_surface", StringType()),
        StructField("obj_begin", IntegerType()),
        StructField("obj_is_literal", IntegerType()),  # 0/1
    ]
)
