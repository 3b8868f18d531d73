"""Deterministic sampling operators (round-4 north-star extension).

A training-data pipeline samples constantly -- smoke-test subsets, eval
holdouts, per-class balancing -- and at 100 TB the sample must be (a)
computable in one map-only pass where possible, (b) REPRODUCIBLE across
runs, partitionings and engines.  Spark's ``DataFrame.sample`` is
seed-stable only per partitioning, so these operators derive keep/rank
decisions from the same affine hash as ``functions/sketch``
(``h(x) = (A*x + B) mod P`` -- plain integer arithmetic, reproduced
verbatim in the DuckDB oracles):

- ``hash_sample``: Bernoulli-style p-fraction by hash threshold.  Map-only
  (no shuffle, no state); the sample is a deterministic FUNCTION of the key,
  so re-runs, retries and incremental loads agree row-for-row -- the
  property seed-based sampling loses the moment partitioning changes.
- ``stratified_sample``: smallest-n-by-hash per stratum -- a per-stratum
  uniform sample of fixed size (hash order is uncorrelated with any data
  attribute).  One shuffle on the stratum key + a bounded per-stratum
  rank; a hot stratum is the KMV situation writ small, and the same
  two-level merge+truncate rewrite applies if a stratum outgrows a task
  (n is tiny by construction -- the rank input per stratum is the stratum
  itself, but only the n survivors leave the aggregation).

Reference note: the reference has no sampling operators (its analyzer
consumes every batch); cited file for the hash constants' provenance is
this repo's ``functions/sketch.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sketch import HASH_A, HASH_B, HASH_P

# hash space is [0, P); a fraction maps to an integer threshold so the
# keep-predicate is pure integer comparison (no float boundary ambiguity)
def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * HASH_P)


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep rows whose key-hash falls under ``fraction`` of the hash space.
    Deterministic, map-only, engine-independent; expected sample size is
    ``fraction * n`` with the usual Bernoulli variance."""
    thr = _threshold(fraction)
    h = (F.lit(HASH_A) * F.col(key) + F.lit(HASH_B)) % F.lit(HASH_P)
    return df.filter(h < F.lit(thr))


def stratified_sample(
    df: DataFrame, stratum: str, key: str, n: int
) -> DataFrame:
    """The ``n`` smallest-hash rows per stratum: a fixed-size uniform
    sample of each group, deterministic and engine-independent.  Ties are
    impossible while ``key`` is unique per stratum (the affine hash is a
    bijection mod P); a repeated key ties on the hash and is broken by the
    key itself."""
    h = (F.lit(HASH_A) * F.col(key) + F.lit(HASH_B)) % F.lit(HASH_P)
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
