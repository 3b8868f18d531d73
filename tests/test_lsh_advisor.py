"""r13 LSH banding advisor: value parity vs the DuckDB oracle runs in
the standard two-SF sweep (test_oracle_queries); this file pins the
contracts that make the advisor TRUSTWORTHY -- the fixed-point S-curve's
endpoints and monotonicity, the recall/cost/threshold trade-off across
factorizations on real data, and the fixed-budget sample property."""

from __future__ import annotations

from streaminglens_spark.functions.dedup import (
    MINHASH_A,
    lsh_band_probability_micro,
    lsh_parameter_advisor,
)

from .conftest import SF_DIR

SCALE = 1_000_000
FACTS = [(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)]


def test_s_curve_fixed_point_properties():
    """Endpoints exact, monotone in n_eq, and monotone in bands at fixed
    n_eq (more bands can only raise the candidate probability)."""
    n_h = len(MINHASH_A)
    for b, r in FACTS:
        ps = [lsh_band_probability_micro(b, r, k) for k in range(n_h + 1)]
        assert ps[0] == 0  # j=0 never collides
        assert ps[-1] == SCALE  # identical signatures always collide
        assert all(x <= y for x, y in zip(ps, ps[1:]))  # monotone in j
        assert all(0 <= p <= SCALE for p in ps)
    for k in range(1, n_h):
        by_bands = [
            lsh_band_probability_micro(b, r, k) for b, r in FACTS
        ]
        assert all(x <= y for x, y in zip(by_bands, by_bands[1:])), k


def test_advisor_tradeoff_and_sample_budget(spark):
    """On the fixture corpus: one row per factorization; candidate mass
    grows and the effective threshold (midpoint) falls as bands grow --
    the knob's whole point; recall is monotone in bands; probabilities
    stay in [0, 1e6]; and the pair join is bounded by the SAMPLE size,
    not the corpus."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_parameter_advisor(docs, sample_fraction=0.2).collect()
    }
    assert set(out) == set(FACTS)
    seq = [out[f] for f in FACTS]
    cand = [r["exp_candidates_micro"] for r in seq]
    assert all(x <= y for x, y in zip(cand, cand[1:]))
    rec = [r["recall_micro"] for r in seq]
    assert all(x <= y for x, y in zip(rec, rec[1:]))
    assert rec[-1] > rec[0]  # the trade-off is visible on real data
    mids = [r["midpoint_k"] for r in seq]
    assert all(x >= y for x, y in zip(mids, mids[1:]))
    for r in seq:
        assert 0 <= r["recall_micro"] <= SCALE
        assert 0 <= r["precision_micro"] <= SCALE
    # fixed budget: expected candidates can never exceed sample pairs
    from streaminglens_spark.functions.sampling import hash_sample

    m = hash_sample(docs.select("doc_id"), "doc_id", 0.2).count()
    max_pairs_micro = m * (m - 1) // 2 * SCALE
    assert all(c <= max_pairs_micro for c in cand)


def test_advisor_row_cap_is_a_hard_budget(spark):
    """r14 (r13 verdict ask #1): ``max_sample_rows`` makes the advisor's
    documented bounded quadratic a FIXED budget -- the sampled pair mass
    is <= cap*(cap-1)/2 on an oversized fixture, and the sample size
    stays ~cap when the corpus doubles (a fraction alone scales the
    pair join with corpus^2; the cap must not)."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P

    cap = 50

    def fixture(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("document text body "), F.col("id")).alias(
                "text"
            ),
        )

    def kept(n):
        # the engine-exact keep predicate, replayed in plain Python
        return sum(
            1
            for i in range(n)
            if ((HASH_A * i + HASH_B) % HASH_P) * n < cap * HASH_P
        )

    # deterministic realized sizes: the budget holds at 4000 docs and
    # does NOT grow when the corpus doubles
    assert kept(4000) == cap
    assert kept(8000) <= cap + 1

    out = lsh_parameter_advisor(
        fixture(4000), sample_fraction=1.0, max_sample_rows=cap
    ).collect()
    max_pairs_micro = cap * (cap - 1) // 2 * SCALE
    assert out, "advisor must emit factorization rows"
    for r in out:
        assert r["exp_candidates_micro"] <= max_pairs_micro

    # corpus doubles -> candidate mass may move (different kept set) but
    # stays inside the SAME fixed budget: the quadratic no longer grows
    # with corpus size
    out2 = lsh_parameter_advisor(
        fixture(8000), sample_fraction=1.0, max_sample_rows=cap
    ).collect()
    max_pairs_micro2 = (cap + 1) * cap // 2 * SCALE
    for r in out2:
        assert r["exp_candidates_micro"] <= max_pairs_micro2
