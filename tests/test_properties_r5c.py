"""Hypothesis property tests for the r5-continued primitives: the
fixed-point log2 (pure-python reference, fast), exact decimal floor
division (Spark job per example, bounded count), and the winnowing
minimizer set against an independent python reference."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streaminglens_spark.functions.intlog import FP_ONE, LOG2_LUT, dec_div, log2_fp
from streaminglens_spark.functions.winnow import (
    WINNOW_K,
    WINNOW_W,
    _minimizer_sets,
)

HASH_MOD = 2_147_483_647


def log2_fp_ref(n: int) -> int:
    """Pure-python mirror of the documented transform."""
    flog = n.bit_length() - 1
    idx = (n >> (flog - 6)) if flog >= 6 else (n << (6 - flog))
    return flog * FP_ONE + LOG2_LUT[idx - 64]


# -- fixed-point log2: pure python, no Spark ------------------------------

@given(n=st.integers(1, 2**63 - 1))
def test_log2_fp_ref_error_bound(n):
    err = log2_fp_ref(n) / FP_ONE - math.log2(n)
    # truncation undershoots by < log2(1 + 1/64); LUT rounding adds 5e-7
    assert -math.log2(1 + 1 / 64) - 1e-6 < err < 1e-6


@given(a=st.integers(1, 2**63 - 2))
def test_log2_fp_ref_monotone(a):
    assert log2_fp_ref(a) <= log2_fp_ref(a + 1)


@given(k=st.integers(0, 62))
def test_log2_fp_ref_exact_powers(k):
    assert log2_fp_ref(1 << k) == k * FP_ONE


# -- Spark log2_fp == python reference (one job per example) --------------

@settings(max_examples=5, deadline=None)
@given(
    ns=st.lists(st.integers(1, 2**63 - 1), min_size=1, max_size=40)
)
def test_spark_log2_matches_reference(spark, ns):
    df = spark.createDataFrame([(v,) for v in ns], "n long")
    got = [r[0] for r in df.select(log2_fp(F.col("n"))).collect()]
    assert got == [log2_fp_ref(v) for v in ns]


@settings(max_examples=5, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 10**25), st.integers(1, 10**13)),
        min_size=1,
        max_size=30,
    )
)
def test_spark_dec_div_matches_floordiv(spark, pairs):
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "a string, b string"
    )
    out = df.select(
        dec_div(
            F.col("a").cast("decimal(38,0)"), F.col("b").cast("decimal(38,0)")
        ).alias("q")
    ).collect()
    assert [int(r["q"]) for r in out] == [a // b for a, b in pairs]


# -- winnowing vs an independent python reference -------------------------

def _fold(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def _ref_minimizers(tokens: list[str], k: int, w: int) -> set[int]:
    if len(tokens) < k:
        return set()
    grams = [
        _fold(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)
    ]
    if len(grams) < w:
        return {min(grams)}
    return {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}


token = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(token, min_size=0, max_size=40), min_size=1, max_size=6
    )
)
def test_winnow_matches_python_reference(spark, docs):
    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: set(r["mins"]) for r in _minimizer_sets(df).collect()
    }
    for i, toks in enumerate(docs):
        # an empty token list still renders as [''] after split
        eff = toks if toks else [""]
        assert got[i] == _ref_minimizers(eff, WINNOW_K, WINNOW_W), (i, toks)
