"""Hypothesis property tests for the round-5 additions: the pure-numpy
KLL core (fast, no Spark) and the normalization chain's invariants over
adversarial generated text (one Spark job per example, bounded count)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from streaminglens_spark.functions.kll import (
    _merge_sketches,
    _quantiles,
    _sketch_values,
)

# -- KLL core (pure numpy, no Spark) --------------------------------------

values = st.lists(
    st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=3000,
)


@given(vals=values, k=st.integers(16, 256))
def test_kll_weight_exact(vals, k):
    """Total weight == input size after ANY compaction cascade."""
    levels, _ = _sketch_values(np.asarray(vals), k)
    n, _ = _quantiles(levels, (50,))
    assert n == len(vals)


@given(vals=values)
def test_kll_estimates_are_input_values(vals):
    """Every estimate is an actual input value (compaction selects, it
    never invents or averages)."""
    levels, _ = _sketch_values(np.asarray(vals), 64)
    _, ests = _quantiles(levels, (50, 95, 99))
    s = set(vals)
    for e in ests:
        assert e in s


@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=10,
        max_size=2000,
    ),
    n_shards=st.integers(1, 8),
)
def test_kll_merge_weight_and_membership(vals, n_shards):
    """Sharded build + merge keeps n exact and estimates in-set for any
    shard assignment."""
    arr = np.asarray(vals)
    parts = [
        (sid, *_sketch_values(arr[sid::n_shards], 64))
        for sid in range(n_shards)
        if len(arr[sid::n_shards])
    ]
    levels, _ = _merge_sketches(parts, 64)
    n, ests = _quantiles(levels, (50, 95, 99))
    assert n == len(vals)
    s = set(vals)
    for e in ests:
        assert e in s


@given(vals=st.lists(st.floats(0, 1e6, allow_nan=False), min_size=200, max_size=2000))
def test_kll_rank_error_generated(vals):
    """Rank error <= 5% at p50/p95/p99 for arbitrary generated inputs
    (k=192; the real-data tests pin 2% -- this is the adversarial net)."""
    arr = np.asarray(vals)
    levels, _ = _sketch_values(arr, 192)
    n, ests = _quantiles(levels, (50, 95, 99))
    v = np.sort(arr)
    for p, est in zip((50, 95, 99), ests):
        lo = np.searchsorted(v, est, side="left")
        hi = np.searchsorted(v, est, side="right")
        target = -(-p * n // 100)
        err = 0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
        assert err / n <= 0.05, (p, est, err / n)


# -- normalization invariants over generated text (Spark; bounded) --------

nasty = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd", "Po"),
        whitelist_characters=" \t\r\n\x00\x07\x0b\x1f\x7f",
    ),
    max_size=120,
)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(nasty, min_size=1, max_size=24))
def test_normalize_invariants_generated(spark, texts):
    """For ANY input: output has no CR/TAB/C0-control/DEL, no double
    space, no space adjacent to a newline, no 3+ newline runs, no edge
    whitespace -- and a second pass is the identity (idempotence), all
    checked via the digest columns over the derived clean strings."""
    import re

    from pyspark.sql import functions as F

    from streaminglens_spark.functions.text import normalize_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", normalize_expr(F.col("text")).alias("c")
        ).collect()
    }
    for i, t in enumerate(texts):
        c = out[i]
        assert not re.search(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\r\t]", c), (t, c)
        assert "  " not in c and " \n" not in c and "\n " not in c, (t, c)
        assert "\n\n\n" not in c
        assert c == c.strip(" \n")
    # idempotence through the engine itself
    again = {
        r["doc_id"]: r["c"]
        for r in spark.createDataFrame(
            [(i, c) for i, c in out.items()], "doc_id long, text string"
        )
        .select("doc_id", normalize_expr(F.col("text")).alias("c"))
        .collect()
    }
    assert again == out
