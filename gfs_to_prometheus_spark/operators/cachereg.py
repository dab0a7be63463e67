"""Bounded registry for operator-internal cached intermediates.

The near-dup / ANN operators ``cache()`` intermediates that feed several
consumers of the RETURNED lazy DataFrame, so they cannot unpersist before
the caller's terminal action runs. Left alone, every invocation leaks its
cached blocks into executor storage for the session lifetime (bench's
min-of-2 passes alone doubles them), degrading long sessions via eviction
pressure.

This registry bounds the leak to ONE invocation per process: each
top-level operator calls :func:`release` on entry — unpersisting every
frame the PREVIOUS invocation registered — then registers its own caches
via :func:`cached`. Callers that want storage back immediately after
landing results may also call ``release()`` themselves (idempotent).

Only TOP-LEVEL operators (the ones queries()/jobs call directly) release;
shared helpers (``candidate_jaccard``, ``minhash_lsh_candidates`` when
composed) only register, so a composing operator never frees its own
in-flight intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def cached(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.cache()`` + register for the next :func:`release`.

    ``eager=True`` lands the cache immediately with a count() (SQL-path
    materialization; see round-3 notes on lazy caches consumed by multiple
    stages of one action recomputing N times).
    """
    df = df.cache()
    _LIVE.append(df)
    if eager:
        df.count()
    return df


def release() -> None:
    """Unpersist every registered cache (blocking=False)."""
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
