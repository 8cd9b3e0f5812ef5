"""Property / invariant tests (SURVEY.md §5):

(a) span-sequence equality (BASELINE.json:15 per-row invariant)
(b) CC labels == pure-Python union-find (random graphs, hypothesis)
(c) salting on/off identical labels
(d) pipeline determinism across parallelism levels
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from canonicity_spark import canonicalize, extract, fixtures


def test_span_sequence_invariant_full_corpus(spark, docs):
    """Explode -> re-assemble must preserve (kind, text, media_ref, order)
    for every doc — the BASELINE.json:15 per-row invariant."""
    back = extract.reassemble_spans(extract.explode_spans(docs))
    orig = {r.doc_id: [tuple(s) for s in r.spans] for r in docs.collect()}
    got = {r.doc_id: [tuple(s) for s in r.spans] for r in back.collect()}
    assert orig == got


def _cc_py(pairs):
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_cc_equals_union_find_random_graphs(spark, data):
    n = data.draw(st.integers(min_value=2, max_value=40))
    n_edges = data.draw(st.integers(min_value=1, max_value=60))
    seed = data.draw(st.integers(min_value=0, max_value=10**6))
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(n)]
    pairs = [tuple(rng.sample(nodes, 2)) for _ in range(n_edges)]
    e = spark.createDataFrame(
        [(a, b, 1.0, "t") for a, b in pairs], ["src", "dst", "w", "etype"]
    )
    # driver_max_edges=0 forces the ITERATIVE distributed kernel — the
    # default would route every drawn graph (<= 60 edges) to the driver
    # union-find, which is itself equivalent to _cc_py by construction
    got = {
        r.node: r.label
        for r in canonicalize.connected_components(e, driver_max_edges=0).collect()
    }
    assert got == _cc_py(pairs)


def _segment_py(t):
    """Pure-Python mirror of the finditer('[^.]+\\.') reference."""
    import re

    if t is None:
        return []
    out = []
    for i, m in enumerate(re.finditer(r"[^.]+\.", t)):
        raw = m.group(0)
        lstrip = len(raw) - len(raw.lstrip())
        out.append((i, raw.strip(), m.start() + lstrip))
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab .\n\tÄ.")),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_segmentation_matches_python_on_arbitrary_text(spark, texts):
    """All Spark segmentation paths must equal the pure-Python finditer
    reference on arbitrary period/whitespace soup (hypothesis)."""
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    from pyspark.sql import functions as F

    got = {
        (r.doc_id, r.s.sent_id, r.s.s_text, r.s.s_begin)
        for r in df.select(
            "doc_id", F.explode(extract.segment_sentences_expr(F.col("text"))).alias("s")
        ).collect()
    }
    want = {
        (str(i), sid, stext, sbegin)
        for i, t in enumerate(texts)
        for sid, stext, sbegin in _segment_py(t)
    }
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            # stopwords, near-stopwords, punctuation-glued variants,
            # digits and whitespace soup — the cases where a regex
            # counter could diverge from the token-list definition
            alphabet=st.sampled_from(list("the ofand.to,in a\nis\tit9")),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_stopword_hits_equals_token_filter(spark, texts):
    """The codegen regexp counter (textops.stopword_hits) must equal
    the HOF token-list definition it replaced, on arbitrary
    whitespace/punctuation soup — pinning the de-HOF rewrite
    (VERDICT round 2 #2) beyond the fixed driver corpus."""
    from pyspark.sql import functions as F

    from canonicity_spark import textops

    ws = textops.STOPWORDS["en"]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.n)
        for r in df.select(
            "doc_id", textops.stopword_hits(ws).alias("n")
        ).collect()
    }
    want = {
        (str(i), sum(1 for tok in t.split() if tok.lower() in ws))
        for i, t in enumerate(texts)
    }
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_incremental_minhash_equivalence_random_corpora(spark, data):
    """Property form of the incremental-dedup contract: for ANY corpus
    and ANY old/new split, minhash_near_dup_against(index(old), new)
    == batch pairs over (old + new) restricted to pairs touching new."""
    from canonicity_spark import similarity

    seed = data.draw(st.integers(min_value=0, max_value=10**6))
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = []
    for i in range(14):
        if docs and rng.random() < 0.5:
            # near-dup of an earlier doc: mutate one token
            base = rng.choice(docs)[1].split()
            base[rng.randrange(len(base))] = rng.choice(vocab)
            docs.append((f"d{i:02d}", " ".join(base)))
        else:
            docs.append(
                (f"d{i:02d}", " ".join(rng.choice(vocab) for _ in range(30)))
            )
    split = rng.randint(1, 13)
    old = spark.createDataFrame(docs[:split], ["doc_id", "text"])
    new = spark.createDataFrame(docs[split:], ["doc_id", "text"])
    new_ids = {d[0] for d in docs[split:]}

    idx = similarity.build_minhash_index(old)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in similarity.minhash_near_dup_against(idx, new).collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in similarity.minhash_near_dup_pairs(
            old.unionByName(new)
        ).collect()
        if r.doc_a in new_ids or r.doc_b in new_ids
    }
    assert got == batch


def test_link_score_spark_equals_python(spark):
    """The fixture generator guarantees goldens under fixtures.link_score;
    this pins the Spark scorer to the same function on fixture data."""
    from canonicity_spark import link

    ents = fixtures._make_entities(random.Random(42), 40)
    pairs = [
        (e.misspelling, a)
        for e in ents
        for other in ents[:10]
        for a in other.dict_aliases
    ]
    df = spark.createDataFrame(pairs, ["norm_surface", "cand_alias"])
    got = link.score_candidates(df).collect()
    for r in got:
        assert abs(r.score - fixtures.link_score(r.norm_surface, r.cand_alias)) < 1e-6


def test_pipeline_deterministic_across_parallelism(spark, docs, alias_dict, tmp_path):
    """Same triples regardless of input partitioning / shuffle width —
    required for the P/R golden to hold at local[8] and local[32]
    (BASELINE.json:14 two cluster sizes)."""
    from canonicity_spark import pipeline

    outs = []
    for i, parts in enumerate([2, 17]):
        conf = pipeline.PipelineConf(work_dir=str(tmp_path / f"w{i}"))
        t = pipeline.run(spark, docs.repartition(parts), alias_dict, conf)
        outs.append(sorted(map(tuple, t.collect())))
    assert outs[0] == outs[1]


def test_pair_cosine_kernel_equals_jvm_hof(spark):
    """The Arrow-batched cosine kernel (similarity._pair_cosine, the
    round-4 hot-path replacement) must agree with the JVM
    zip_with/aggregate formula it replaced, to the 6-decimal rounding
    both the operators and the DuckDB oracles use — on random vectors
    including negatives, zeros-heavy, and tiny-magnitude cases."""
    import random as _random

    from pyspark.sql import functions as F

    from canonicity_spark import similarity

    rng = _random.Random(7)
    rows = []
    for i in range(200):
        dim = 64
        a = [rng.uniform(-2, 2) for _ in range(dim)]
        b = [rng.uniform(-2, 2) for _ in range(dim)]
        if i % 7 == 0:  # zeros-heavy
            a = [x if j % 5 == 0 else 0.0 for j, x in enumerate(a)]
        if i % 11 == 0:  # tiny magnitude
            b = [x * 1e-6 for x in b]
        rows.append((i, a, b))
    df = spark.createDataFrame(
        rows, "id int, va array<float>, vb array<float>"
    )
    hof = similarity._dot(F.col("va"), F.col("vb")) / (
        F.sqrt(similarity._dot(F.col("va"), F.col("va")))
        * F.sqrt(similarity._dot(F.col("vb"), F.col("vb")))
    )
    out = df.select(
        "id",
        F.round(hof, 6).alias("jvm"),
        F.round(similarity._pair_cosine("va", "vb"), 6).alias("kernel"),
    ).collect()
    for r in out:
        assert abs(r.jvm - r.kernel) <= 1e-6, (r.id, r.jvm, r.kernel)
