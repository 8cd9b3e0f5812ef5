"""Persist bookkeeping (ADVICE round 1: persisted frames leaked).

Operators that persist() intermediate vocabulary-sized frames
(link.link_surfaces, similarity.minhash_near_dup_pairs,
similarity.embedding_near_dup_pairs) register them here instead of
calling persist() bare, tagged with an *owner* scope. Release happens

- at operator ENTRY: each op calls ``unpin_all(owner=<itself>)`` to
  release ITS OWN previous invocation's pins (safe because by the time
  the op runs again, the previous invocation's result has been
  materialized by its action; scoping means a nested call — e.g.
  link.run inside a pipeline stage — never releases its caller's
  still-needed pins), and
- in pipeline.run after each stage write via ``unpin_all()`` (the
  stage output is parquet-backed, so every pinned upstream is done).

This bounds cached-block accumulation in a long-lived session to one
invocation per operator instead of growing without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[tuple[str, DataFrame]] = []


def pin(df: DataFrame, owner: str = "default") -> DataFrame:
    """persist() + register under ``owner`` for later release."""
    df = df.persist()
    _PINNED.append((owner, df))
    return df


def unpin_all(owner: str | None = None) -> int:
    """Unpersist registered frames (all, or just ``owner``'s); returns
    how many were released."""
    n = 0
    keep = []
    while _PINNED:
        own, df = _PINNED.pop()
        if owner is not None and own != owner:
            keep.append((own, df))
            continue
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _PINNED.extend(reversed(keep))
    return n
