"""Tracked persist() for library use.

Operators that materialize an intermediate before fanning out
(``minhash_lsh_pairs``'s signature base, ``ivf_topk``'s inverted index)
must leave the cached block alive until the CALLER runs its action -- the
returned DataFrame is lazy and reads the persisted node.  That means the
operator itself cannot unpersist, and in a long-lived session repeated
calls would accumulate cached blocks until something external calls
``spark.catalog.clearCache()`` (the bench does; a library consumer or the
live path would not).

``track()`` registers each such persist here; callers release them with
``release_caches()`` (or the ``tracked_caches()`` context manager) once
their action has completed.  Fail-open: releasing never raises, and
re-running an operator after a release just re-persists.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK -- an operator intermediate must not
    silently recompute if it outgrows memory) and register it for
    ``release_caches()``.

    Idempotent (ADVICE r6): an already-persisted DataFrame is returned
    unchanged -- the caller that persisted it owns its lifetime, so it is
    neither re-persisted (a no-op warning in Spark) nor double-registered
    in the release bookkeeping."""
    if df.is_cached:
        return df
    df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    return df


def adopt(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame for ``release_caches()``
    (for operators that persist inside an iterative loop and hand the
    final iterate to the caller)."""
    _PERSISTED.append(df)
    return df


def untrack(df: DataFrame) -> None:
    """Unpersist ``df`` and drop it from the release registry, fail-open
    (r15, ADVICE r14: iterative loops that supersede tracked generations
    -- the BPE merge rounds -- were reaching into ``_PERSISTED`` and
    re-implementing this inline).  A no-op for frames that were never
    tracked; for ``localCheckpoint``'ed frames the unpersist call does
    NOT free the checkpoint RDD blocks (those are released by GC /
    ContextCleaner, same as before) -- callers pass checkpointed parents
    only for the registry cleanup."""
    try:
        df.unpersist()
    except Exception:
        pass
    while df in _PERSISTED:
        _PERSISTED.remove(df)


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released.  Safe to call at any time (idempotent, never raises)."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


@contextlib.contextmanager
def tracked_caches():
    """``with tracked_caches(): run_operator(...).collect()`` -- releases
    every intermediate persisted inside the block on exit."""
    mark = len(_PERSISTED)
    try:
        yield
    finally:
        while len(_PERSISTED) > mark:
            df = _PERSISTED.pop()
            try:
                df.unpersist()
            except Exception:
                pass
