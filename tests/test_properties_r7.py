"""Hypothesis property tests for the round-7 additions, each against an
independent brute-force Python reference (the Spark operator and the
reference share NO code):

- ``shared_spans`` vs a naive all-pairs maximal-common-token-run scan
  (min_shared=1, where the winnowing guarantee makes detection of
  >= w+k-1 spans exhaustive);
- ``token_budget_sample`` vs a sorted-cumsum reference of the kept set;
- the integer half-away-from-zero division used by the refit micro forms
  vs Python's Fraction rounding.

Spark examples are bounded (one job per example, few examples) -- the
heavy randomized mileage goes to the pure-Python divider property.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P
from streaminglens_spark.functions.text import HASH_MOD

# -- integer half-away-from-zero division (pure python, heavy mileage) ----


def _half_up_div(n: int, d: int) -> int:
    """The SQL formula used by kmeans_update/pq_update micro forms."""
    if n < 0:
        return -((2 * -n + d) // (2 * d))
    return (2 * n + d) // (2 * d)


@given(
    n=st.integers(-(10**17), 10**17),
    d=st.integers(1, 10**12),
)
@settings(max_examples=500)
def test_half_up_div_matches_fraction_rounding(n, d):
    """(2|N| + D) div (2D) with sign restored == round-half-away-from-zero
    of the exact rational N/D, for the full magnitude range the refit
    arithmetic can produce (no double precision cliff)."""
    q = Fraction(n, d)
    floor_q = q.numerator // q.denominator  # true floor
    frac = q - floor_q
    if frac > Fraction(1, 2):
        want = floor_q + 1
    elif frac < Fraction(1, 2):
        want = floor_q
    else:  # exact half: away from zero
        want = floor_q + 1 if q >= 0 else floor_q
    assert _half_up_div(n, d) == want, (n, d)


# -- shared_spans vs brute force (bounded Spark examples) -----------------


def _gram_hash(tokens: list[str]) -> int:
    h = 0
    for ch in " ".join(tokens):
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def _brute_spans(doc_a: list[str], doc_b: list[str], k: int = 3):
    """All maximal shared gram-runs between two token lists, by direct
    diagonal scan over gram-hash equality (mirrors the operator's
    detection definition, implemented independently)."""
    ga = [_gram_hash(doc_a[i : i + k]) for i in range(len(doc_a) - k + 1)]
    gb = [_gram_hash(doc_b[i : i + k]) for i in range(len(doc_b) - k + 1)]
    match = {(i, j) for i, a in enumerate(ga) for j, b in enumerate(gb) if a == b}
    spans = []
    for i, j in sorted(match):
        if (i - 1, j - 1) in match:
            continue  # not a run start
        ln = 0
        while (i + ln, j + ln) in match:
            ln += 1
        spans.append((i + 1, j + 1, ln + k - 1))  # 1-based, token length
    return spans


WORDS = [f"w{i:02d}" for i in range(40)]
token_lists = st.lists(st.sampled_from(WORDS), min_size=8, max_size=30)


@given(a=token_lists, b=token_lists)
@settings(max_examples=8, deadline=None)
def test_shared_spans_match_brute_force(spark, a, b):
    from streaminglens_spark.functions.winnow import shared_spans

    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b))], "doc_id long, text string"
    )
    got = {
        (r["start_a"], r["start_b"], r["n_tokens"])
        for r in shared_spans(df, min_shared=1).collect()
    }
    want = {s for s in _brute_spans(a, b) if s[2] >= 6}
    # exhaustive at the guarantee floor: every brute-force span of
    # >= w+k-1 tokens must be found, and nothing else
    assert got == want, (got, want, a, b)


# -- token_budget_sample vs sorted-cumsum reference -----------------------


@given(
    lens=st.lists(st.integers(1, 9), min_size=1, max_size=25),
    budget=st.integers(1, 120),
)
@settings(max_examples=6, deadline=None)
def test_token_budget_matches_reference(spark, lens, budget):
    from streaminglens_spark.functions.sampling import token_budget_sample

    docs = [(i, " ".join(["t"] * n), "s") for i, n in enumerate(lens)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r["doc_id"]
        for r in token_budget_sample(df, "source", "doc_id", {"s": budget}).collect()
    }
    order = sorted(
        range(len(lens)), key=lambda i: ((HASH_A * i + HASH_B) % HASH_P, i)
    )
    want, cum = set(), 0
    for i in order:
        if cum >= budget:
            break
        want.add(i)
        cum += lens[i]
    assert got == want, (got, want, lens, budget)
