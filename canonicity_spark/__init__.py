"""canonicity_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of ``colinsongf/canonicity_old``.

The reference checkout at /root/reference is empty (SURVEY.md §0); the
authoritative behavioural spec is the driver contract in
/root/repo/BASELINE.json (north_star / north_rule / input_hint). Every
module cites the spec it implements instead of reference file:line.

Pipeline stages (SURVEY.md §3):

    documents --extract--> mentions, raw_triples
    mentions  --link-----> scored_links (+ NIL routing)
    links     --canonicalize--> labels (connected components)
    triples ⋈ labels --materialize--> triples, entities

All stages are pure ``DataFrame -> DataFrame`` transforms built on the
DataFrame API (Catalyst-optimised); Python enters only through
vectorized pandas/Arrow UDFs (BASELINE.json:15 — "no per-row Python").
"""

__version__ = "0.1.0"
