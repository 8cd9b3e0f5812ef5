"""Deterministic fixture corpus generator (FIXTURES.md §1–3, seed 42).

Generates the interleaved-document corpus pinned by BASELINE.json:15,
an alias dictionary side table (BASELINE.json:6 "alias dictionary
broadcast"), and golden triples/clusters derived *by construction* —
the template grammar below is also what the rule-based extractor in
``extract.py`` parses, so a correct pipeline reproduces the goldens at
P/R = 1.0 (acceptance bar is ≥ 0.95, BASELINE.json:2).

Pure Python + pandas + pyarrow; no Spark dependency, no wall-clock
entropy. Deterministic across runs and parallelism levels.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

# --- grammar ----------------------------------------------------------------

# pred -> (phrase, obj_type). Phrases are matched longest-first by the
# extractor; none is a prefix of another and no alias token collides
# with a phrase token (alias vocabulary is the fantasy syllable pool).
PREDICATES: dict[str, tuple[str, str]] = {
    "founded_by": ("was founded by", "entity"),
    "located_in": ("is located in", "entity"),
    "works_for": ("works for", "entity"),
    "acquired": ("acquired", "entity"),
    "ceo_of": ("is the ceo of", "entity"),
    "partner_of": ("partnered with", "entity"),
    "subsidiary_of": ("is a subsidiary of", "entity"),
    "invested_in": ("invested in", "entity"),
    "competitor_of": ("competes with", "entity"),
    "supplier_of": ("supplies parts to", "entity"),
    "founded_in": ("was founded in", "year"),
    "employs": ("employs", "count"),
}

MEDIA_PRED = "hasMedia"

SYLLABLES = [
    "zor", "qua", "vex", "mira", "tal", "dor", "fen", "lux", "bar", "nim",
    "kel", "sor", "pra", "vul", "thi", "gom", "rex", "una", "pol", "yar",
]
SUFFIXES = ["corp", "labs", "group", "systems", "holdings", "institute"]


def norm(s: str) -> str:
    """The same normalization extract.py applies (N1): lower + collapse ws."""
    return " ".join(s.lower().split())


def _shingles(s: str, n: int = 3) -> set[str]:
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def link_score(surface: str, alias: str) -> float:
    """Pure-Python mirror of link.score_candidates — the fixture uses it
    to guarantee every generated misspelling is unambiguous (its own
    entity's alias outscores every other dictionary alias with margin),
    so goldens are achievable by construction. tests/unit assert the
    Spark formula agrees with this function."""
    if surface == alias:
        return 1.0
    s1, s2 = _shingles(surface), _shingles(alias)
    jac = len(s1 & s2) / len(s1 | s2)
    lev_sim = 1.0 - _lev(surface, alias) / max(len(surface), len(alias))
    return round(0.5 * jac + 0.5 * lev_sim, 6)


@dataclass
class Entity:
    entity_id: str
    canonical_name: str            # normalized canonical surface
    dict_aliases: list[str]        # normalized, present in alias_dict
    misspelling: str               # normalized, NOT in alias_dict (LSH must recover)
    weight: float = 0.0
    all_aliases: list[str] = field(default_factory=list)


def _make_entities(rng: random.Random, n: int) -> list[Entity]:
    bases: list[str] = []
    seen: set[str] = set()
    pairs = [(a, b) for a in SYLLABLES for b in SYLLABLES]
    rng.shuffle(pairs)
    for a, b in pairs:
        base = a + b
        if base not in seen:
            seen.add(base)
            bases.append(base)
        if len(bases) >= n:
            break
    # pass 1: canonical + abbreviation aliases (the dictionary)
    ents: list[Entity] = []
    taken: set[str] = set()
    for i, base in enumerate(bases):
        suffix = SUFFIXES[i % len(SUFFIXES)]
        canonical = f"{base} {suffix}"
        abbrev = base
        for s in (canonical, abbrev):
            assert s not in taken, f"alias collision: {s}"
            taken.add(s)
        ents.append(
            Entity(
                entity_id=f"E{i:04d}",
                canonical_name=canonical,
                dict_aliases=[canonical, abbrev],
                misspelling="",
                weight=1.0 / (i + 1) ** 1.2,  # Zipf(s=1.2) — hot entities for skew
            )
        )

    # pass 2: one misspelling per entity, chosen so the linker's scoring
    # function is guaranteed to resolve it to its own entity with a
    # margin — goldens must be achievable by construction, and a dense
    # syllable pool makes some edit-distance-1 variants genuinely
    # ambiguous otherwise.
    dict_aliases = [(a, e.entity_id) for e in ents for a in e.dict_aliases]
    for e in ents:
        base, suffix = e.canonical_name.rsplit(" ", 1)
        cands: list[str] = []
        for pos in range(2, len(base)):  # drop one char
            cands.append(f"{base[:pos] + base[pos + 1:]} {suffix}")
        for pos in range(1, len(base) - 1):  # swap adjacent chars
            sw = base[:pos] + base[pos + 1] + base[pos] + base[pos + 2 :]
            if sw != base:
                cands.append(f"{sw} {suffix}")
        for pos in range(1, len(base)):  # double a char
            cands.append(f"{base[:pos] + base[pos - 1] + base[pos:]} {suffix}")
        chosen = None
        for cand in cands:
            if cand in taken:
                continue
            own = max(link_score(cand, a) for a in e.dict_aliases)
            other = max(
                link_score(cand, a) for a, eid in dict_aliases if eid != e.entity_id
            )
            if own >= other + 0.05:
                chosen = cand
                break
        assert chosen is not None, f"no unambiguous misspelling for {base}"
        taken.add(chosen)
        e.misspelling = chosen
        e.all_aliases = e.dict_aliases + [chosen]
    return ents


def _case_variant(rng: random.Random, s: str) -> str:
    v = rng.randrange(3)
    if v == 0:
        return s
    if v == 1:
        return s.upper()
    return s.title()


NOISE_SENTENCES = [
    "nothing of note happened here today.",
    "the weather stayed calm across the region.",
    "several unrelated remarks followed without consequence.",
]
NOISE_FRAGMENTS = [
    "meanwhile the story simply trailed off",
    "and then without any closing remark",
]
MESSY_SEPS = [" ", "\n", "  ", " \n "]


def generate(
    out_dir: str,
    n_docs: int = 200,
    n_entities: int = 200,
    seed: int = 42,
    misspell_rate: float = 0.15,
    doc_id_offset: int = 0,
    messy: bool = False,
) -> dict[str, str]:
    """Write documents/alias_dict/entity_pool/golden_* parquet to out_dir.

    ``messy`` (VERDICT round 2 #8) injects grammar-neutral noise so the
    fused parse kernel's edge semantics are pinned END-TO-END by a P/R
    golden, not only by parity tests. Every noise class is provably
    inert under the documented segmentation (finditer ``[^.]+\\.``) and
    parse grammar, so the golden set is unchanged by construction:
    - ``..``/``...`` runs after a sentence -> empty split pieces, dropped;
    - ``.\\n`` / ``.  `` / mixed-whitespace separators -> leading
      whitespace of the next piece, lstripped with exact offsets;
    - non-grammar filler sentences (no predicate phrase) -> segmented
      but unparsed, yielding no mention/triple;
    - a trailing unterminated fragment (no ``.``) -> the final split
      piece, which the reference segmentation drops.

    Returns {table_name: path}.
    """
    # entity pool depends ONLY on seed (identical across parallel
    # chunks); the document stream is keyed by (seed, doc_id_offset)
    ents = _make_entities(random.Random(seed), n_entities)
    rng = random.Random(f"{seed}:{doc_id_offset}")
    weights = [e.weight for e in ents]
    preds = sorted(PREDICATES)

    doc_ids: list[str] = []
    doc_spans: list[list[dict]] = []
    golden: list[tuple[str, str, str, str]] = []  # subj, pred, obj, doc_id

    def pick_entity() -> Entity:
        return rng.choices(ents, weights=weights, k=1)[0]

    def surface_of(e: Entity) -> str:
        if rng.random() < misspell_rate:
            return _case_variant(rng, e.misspelling)
        return _case_variant(rng, rng.choice(e.dict_aliases))

    for d in range(n_docs):
        doc_id = f"D{d + doc_id_offset:08d}"
        n_text = rng.randint(1, 8)
        n_media = rng.randint(0, 3)
        # interleave: positions of media spans among the text spans
        kinds = ["text"] * n_text + ["media"] * n_media
        rng.shuffle(kinds)
        spans: list[dict] = []
        offset = 0
        media_k = 0
        for kind in kinds:
            if kind == "text":
                sentences = []
                for _ in range(rng.randint(1, 3)):
                    subj = pick_entity()
                    pred = rng.choice(preds)
                    phrase, obj_type = PREDICATES[pred]
                    if obj_type == "entity":
                        obj = pick_entity()
                        while obj.entity_id == subj.entity_id:
                            obj = pick_entity()
                        obj_surface = surface_of(obj)
                        golden.append((subj.entity_id, pred, obj.entity_id, doc_id))
                    elif obj_type == "year":
                        obj_surface = str(1900 + rng.randint(0, 120))
                        golden.append((subj.entity_id, pred, obj_surface, doc_id))
                    else:  # count
                        obj_surface = str(rng.randint(1, 99999))
                        golden.append((subj.entity_id, pred, obj_surface, doc_id))
                    sentences.append(f"{surface_of(subj)} {phrase} {obj_surface}.")
                if messy:
                    parts: list[str] = []
                    for s in sentences:
                        if rng.random() < 0.3:
                            s += "." * rng.randint(1, 2)  # '..' / '...' runs
                        parts.append(s)
                        if rng.random() < 0.2:
                            parts.append(rng.choice(NOISE_SENTENCES))
                    text = parts[0]
                    for p in parts[1:]:
                        text += rng.choice(MESSY_SEPS) + p
                    if rng.random() < 0.3:  # unterminated tail fragment
                        text += rng.choice(MESSY_SEPS) + rng.choice(NOISE_FRAGMENTS)
                else:
                    text = " ".join(sentences)
                spans.append(
                    {"kind": "text", "text": text, "media_ref": None, "offset": offset}
                )
                offset += len(text) + 1
            else:
                ref = f"media://{doc_id}/{media_k}"
                media_k += 1
                mkind = rng.choice(["image", "video"])
                spans.append(
                    {"kind": mkind, "text": None, "media_ref": ref, "offset": offset}
                )
                offset += 1
                golden.append((f"doc:{doc_id}", MEDIA_PRED, ref, doc_id))
        doc_ids.append(doc_id)
        doc_spans.append(spans)

    span_type = pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(doc_spans, pa.list_(span_type)),
        }
    )

    alias_rows = [
        (a, e.entity_id, min(1.0, e.weight))
        for e in ents
        for a in e.dict_aliases
    ]
    alias_tbl = pa.table(
        {
            "alias": pa.array([r[0] for r in alias_rows], pa.string()),
            "entity_id": pa.array([r[1] for r in alias_rows], pa.string()),
            "prior": pa.array([r[2] for r in alias_rows], pa.float64()),
        }
    )
    pool_tbl = pa.table(
        {
            "entity_id": pa.array([e.entity_id for e in ents], pa.string()),
            "canonical_name": pa.array([e.canonical_name for e in ents], pa.string()),
        }
    )
    golden_tbl = pa.table(
        {
            "subj": pa.array([g[0] for g in golden], pa.string()),
            "pred": pa.array([g[1] for g in golden], pa.string()),
            "obj": pa.array([g[2] for g in golden], pa.string()),
            "doc_id": pa.array([g[3] for g in golden], pa.string()),
        }
    )
    cluster_rows = [(a, e.entity_id) for e in ents for a in e.all_aliases]
    clusters_tbl = pa.table(
        {
            "surface": pa.array([r[0] for r in cluster_rows], pa.string()),
            "entity_id": pa.array([r[1] for r in cluster_rows], pa.string()),
        }
    )

    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, tbl in [
        ("documents", docs_tbl),
        ("alias_dict", alias_tbl),
        ("entity_pool", pool_tbl),
        ("golden_triples", golden_tbl),
        ("golden_clusters", clusters_tbl),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        # small row groups so Spark's scan splits a single file across
        # executors without needing an up-front repartition shuffle
        pq.write_table(tbl, p, row_group_size=2048)
        paths[name] = p
    return paths


def _gen_chunk(args: tuple) -> str:
    out_dir, chunk_id, n_docs, offset, n_entities, seed, misspell_rate, messy = args
    chunk_dir = os.path.join(out_dir, f"_chunk{chunk_id:04d}")
    generate(
        chunk_dir,
        n_docs=n_docs,
        n_entities=n_entities,
        seed=seed,
        misspell_rate=misspell_rate,
        doc_id_offset=offset,
        messy=messy,
    )
    return chunk_dir


def generate_parallel(
    out_dir: str,
    n_docs: int,
    n_entities: int = 200,
    seed: int = 42,
    misspell_rate: float = 0.15,
    workers: int = 8,
    chunk_docs: int = 250_000,
    messy: bool = False,
) -> dict[str, str]:
    """Chunked multi-process corpus generation for bench-scale corpora.

    Deterministic: chunk i uses seed ``seed + i`` and doc ids offset by
    ``i * chunk_docs``; the entity pool (seed-derived) is identical in
    every chunk, so alias_dict/entity_pool are taken from chunk 0 and
    documents/golden tables are concatenated as multi-file parquet
    directories (Spark reads directories natively).
    """
    import multiprocessing as mp
    import shutil

    n_chunks = (n_docs + chunk_docs - 1) // chunk_docs
    if n_chunks <= 1:
        return generate(out_dir, n_docs, n_entities, seed, misspell_rate, messy=messy)
    os.makedirs(out_dir, exist_ok=True)
    jobs = [
        (
            out_dir,
            i,
            min(chunk_docs, n_docs - i * chunk_docs),
            i * chunk_docs,
            n_entities,
            seed,
            misspell_rate,
            messy,
        )
        for i in range(n_chunks)
    ]
    with mp.Pool(min(workers, n_chunks)) as pool:
        chunk_dirs = pool.map(_gen_chunk, jobs)

    paths: dict[str, str] = {}
    for name in ("documents", "golden_triples", "golden_clusters"):
        dest = os.path.join(out_dir, f"{name}.parquet")
        os.makedirs(dest, exist_ok=True)
        for i, cd in enumerate(chunk_dirs):
            os.rename(
                os.path.join(cd, f"{name}.parquet"),
                os.path.join(dest, f"part-{i:04d}.parquet"),
            )
        paths[name] = dest
    for name in ("alias_dict", "entity_pool"):
        dest = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dest):
            os.remove(dest)
        os.rename(os.path.join(chunk_dirs[0], f"{name}.parquet"), dest)
        paths[name] = dest
    for cd in chunk_dirs:
        shutil.rmtree(cd, ignore_errors=True)
    return paths


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH/data/tiny"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    print(generate_parallel(out, n_docs=n))
