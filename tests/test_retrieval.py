"""Integer-log2 primitive + the retrieval/scoring operators built on it:
BM25 inverted-index search and bigram-LM surprisal (r5 continued).

The cross-engine hash checks live in test_oracle_queries.py (both queries
are on LOCAL_ORACLE); these tests pin the SEMANTICS (known-answer goldens,
monotonicity) and the plan shape (broadcast query side, zero Python)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from streaminglens_spark.functions.intlog import (
    FP_ONE,
    LOG2_LUT,
    dec,
    dec_div,
    log2_fp,
)
from streaminglens_spark.functions.lm import bigram_surprisal, doc_bigrams
from streaminglens_spark.functions.search import bm25_search
from streaminglens_spark.plans.audit import python_udf_count, uses_broadcast_join
from streaminglens_spark import registry
from tests.conftest import SF_DIR


# ------------------------------------------------------------- intlog core

def test_log2_fp_error_bound(spark):
    """Quantized log2 is within the documented mantissa-truncation bound
    (< log2(1 + 1/64) + LUT rounding) of the real log2, across magnitudes
    from 1 to 2^62."""
    vals = [1, 2, 3, 5, 63, 64, 65, 127, 128, 255, 12345, 2**31 - 1,
            10**12 + 7, 2**62 + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    out = [r[0] for r in df.select(log2_fp(F.col("n"))).collect()]
    bound = math.log2(1 + 1 / 64) + 1e-6
    for v, got in zip(vals, out):
        err = abs(got / FP_ONE - math.log2(v))
        assert err < bound, (v, got, err)
        # truncation never overshoots (beyond LUT rounding)
        assert got / FP_ONE <= math.log2(v) + 1e-6


def test_log2_fp_exact_on_powers_of_two(spark):
    df = spark.createDataFrame([(1 << k,) for k in range(63)], "n long")
    out = [r[0] for r in df.select(log2_fp(F.col("n"))).collect()]
    assert out == [k * FP_ONE for k in range(63)]


def test_lut_is_monotone_and_anchored():
    assert LOG2_LUT[0] == 0
    assert all(a < b for a, b in zip(LOG2_LUT, LOG2_LUT[1:]))
    assert LOG2_LUT[-1] < FP_ONE  # log2(127/64) < 1


def test_dec_div_is_exact_floor(spark):
    """dec_div == true mathematical floor on 38-digit operands -- including
    the HALF_UP overshoot cases plain floor(a / b) gets wrong."""
    cases = [
        (10**25 - 1, 3),
        (10**25, 10**12 + 7),
        # adversarial: remainder within 5e-7 of the divisor (frac rounds
        # up at scale 6, so floor(round(q)) would overshoot by one)
        (4 * 10**13 - 1, 2 * 10**13),
        (10**20 * (10**7 - 1) + 10**20 - 1, 10**20),
    ]
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in cases], "a string, b string"
    )
    out = df.select(
        dec_div(
            F.col("a").cast("decimal(38,0)"), F.col("b").cast("decimal(38,0)")
        ).alias("q")
    ).collect()
    for r, (a, b) in zip(out, cases):
        assert int(r["q"]) == a // b, (a, b, r["q"])


# ------------------------------------------------------------- BM25 search

@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "apple cherry"),
        (2, "banana banana banana cherry"),
        (3, "durian elderberry fig grape"),
        (4, "apple apple apple apple apple apple apple apple"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_rare_term_outranks_common(tiny_corpus):
    """durian appears in exactly one doc: searching it must rank doc 3
    first with a positive score, and no other doc may appear."""
    out = bm25_search(tiny_corpus, [("q", "durian")]).collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(3, 1)]
    assert out[0]["score_fp"] > 0


def test_bm25_tf_saturation_and_length_norm(tiny_corpus):
    """'apple' ranks doc 4 (tf=8) > doc 0 (tf=2) > doc 1 (tf=1), but
    SUBLINEARLY: 4x the tf (and 2.7x the length) buys doc 4 less than
    1.2x doc 0's score (hand-computed: 1.758 vs 1.495 in idf units) --
    k1 saturation plus the b=0.75 length penalty."""
    out = bm25_search(tiny_corpus, [("q", "apple")]).collect()
    scores = {r["doc_id"]: r["score_fp"] for r in out}
    assert set(scores) == {0, 1, 4}
    assert scores[4] > scores[0] > scores[1]
    assert scores[4] < 2 * scores[0], "tf must saturate, not scale linearly"


def test_bm25_multi_term_sums(tiny_corpus):
    """A doc matching both query terms must outrank docs matching one
    (here doc 2 has banana+cherry; docs 0/1/4 match a single term)."""
    out = bm25_search(tiny_corpus, [("q", "banana cherry")]).collect()
    best = min(out, key=lambda r: r["rank"])
    assert best["doc_id"] == 2


def test_bm25_plan_broadcasts_and_no_python(spark):
    df = registry.q_bm25_search(spark, SF_DIR)
    assert uses_broadcast_join(df), "query terms / df stats must broadcast"
    assert python_udf_count(df) == 0, "BM25 must stay JVM-side"


# -------------------------------------------------------- bigram surprisal

def test_doc_bigrams_edges(spark):
    rows = [(0, "a b c"), (1, "solo"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["w1"], r["w2"]) for r in doc_bigrams(df).collect()}
    assert out == {(0, "a", "b"), (0, "b", "c")}


def test_surprisal_common_below_rare(spark):
    """Docs made of the corpus's dominant bigram score lower mean
    surprisal than a doc of one-off bigrams -- the property the
    perplexity filter exists for."""
    rows = [(i, "the cat sat here") for i in range(8)]
    rows.append((100, "zephyr quark vortex nimbus"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    assert out[0]["mean_micro_bits"] < out[100]["mean_micro_bits"]
    # all eight template docs identical
    assert len({out[i]["total_micro_bits"] for i in range(8)}) == 1
    # surprisal is a sum of positive terms (c1 + V > c12 + 1 always:
    # c1 >= c12 and V >= 2 for any corpus with a bigram)
    assert all(r["total_micro_bits"] > 0 for r in out.values())


def test_surprisal_mean_is_floor_of_total(spark):
    rows = [(0, "u v w x y"), (1, "u v u v")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in bigram_surprisal(df).collect():
        assert r["mean_micro_bits"] == r["total_micro_bits"] // r["n_bigrams"]


def test_surprisal_no_python(spark):
    df = registry.q_bigram_surprisal(spark, SF_DIR)
    assert python_udf_count(df) == 0, "surprisal must stay JVM-side"


# ----------------------------------------------------- incremental builds

def test_postings_union_of_disjoint_batches(spark):
    """The inverted index is incrementally maintainable: postings built
    per ingest batch (disjoint doc_ids) union to exactly the full-corpus
    postings -- tf is per-doc and dl windows only the doc's own rows."""
    from streaminglens_spark.functions.search import build_postings

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)
    full = {tuple(r) for r in build_postings(docs).collect()}
    merged = {
        tuple(r)
        for r in build_postings(h1).unionByName(build_postings(h2)).collect()
    }
    assert merged == full


def test_bigram_counts_merge_additively(spark):
    """Bigram model counts are additive: summing per-shard c12 tables
    and re-deriving c1 reproduces the full-corpus model -- the property
    that makes the LM trainable incrementally (per day / per shard)."""
    from streaminglens_spark.functions.lm import bigram_counts, doc_bigrams

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)
    full = {tuple(r) for r in bigram_counts(docs).collect()}

    def c12(d):
        return doc_bigrams(d).groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("long").alias("c12")
        )

    merged_c12 = (
        c12(h1).unionByName(c12(h2))
        .groupBy("w1", "w2")
        .agg(F.sum("c12").cast("long").alias("c12"))
    )
    merged_c1 = merged_c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1")
    )
    merged = {tuple(r) for r in merged_c12.join(merged_c1, "w1").collect()}
    assert merged == full


# ------------------------------------------------- self-retrieval harness

def test_self_retrieval_contract(spark):
    """The quality pin: snippet queries find their source doc top-1 at
    >= 90% on the fixture under the phrase-aware index (measured 20/20)."""
    rows = registry.q_bm25_eval(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_probes"] >= 10
    assert r["top1_hits"] * 10 >= r["n_probes"] * 9, dict(r.asDict())
    assert r["top10_hits"] >= r["top1_hits"]


def test_bigram_terms_restore_contrast(spark):
    """The reason the harness indexes bigrams: on the fixture's tiny
    vocabulary, unigram-only retrieval finds far fewer sources (measured
    2/20 vs 20/20) -- the harness exists to detect exactly this
    term-space saturation."""
    from streaminglens_spark.functions.search import (
        PROBE_MOD,
        SNIPPET_LEN,
        SNIPPET_START,
        bm25_search_df,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    toks = F.split(F.col("text"), " ")
    probes = (
        docs.filter(F.col("doc_id") % PROBE_MOD == 0)
        .filter(F.size(toks) >= SNIPPET_START + SNIPPET_LEN - 1)
        .select(
            F.col("doc_id").cast("string").alias("query_id"),
            F.concat_ws(
                " ", F.slice(toks, SNIPPET_START, SNIPPET_LEN)
            ).alias("qtext"),
        )
    )

    def top1(bigrams):
        ranked = bm25_search_df(docs, probes, bigrams=bigrams)
        return ranked.filter(
            (F.col("rank") == 1)
            & (F.col("query_id") == F.col("doc_id").cast("string"))
        ).count()

    uni, bi = top1(False), top1(True)
    assert bi > 2 * uni, f"bigram index must dominate: uni={uni} bi={bi}"


def test_bigram_postings_term_count(spark):
    from streaminglens_spark.functions.search import build_postings

    df = spark.createDataFrame([(0, "a b c a")], "doc_id long, text string")
    rows = {r["term"]: r for r in build_postings(df, bigrams=True).collect()}
    # 4 unigram instances + 3 bigram instances = dl 7
    assert set(rows) == {"a", "b", "c", "a_b", "b_c", "c_a"}
    assert rows["a"]["tf"] == 2 and rows["a"]["dl"] == 7


# ------------------------------------------------------- PMI collocations

def test_pmi_planted_collocation_wins(spark):
    """'new york' always co-occurs while the filler words around it
    appear in VARYING orders (so filler bigrams are frequent as
    unigrams but rare as pairs): the collocation must rank first, and
    rare pairs fall to min_count.  (An all-identical corpus is
    degenerate -- every adjacent pair ties at maximal PMI.)"""
    from streaminglens_spark.functions.lm import pmi_collocations

    filler = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    rows = []
    for i in range(20):
        words = [filler[(i + j * j) % 8] for j in range(8)]
        rows.append((i, " ".join(words[:4]) + " new york " + " ".join(words[4:])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, k=10).collect()
    assert out[0]["w1"] == "new" and out[0]["w2"] == "york"
    assert out[0]["c12"] == 20
    for r in out[1:]:
        assert r["pmi_micro_bits"] < out[0]["pmi_micro_bits"]
        assert r["c12"] >= 5  # min_count honored


def test_pmi_values_match_math(spark):
    """The fixed-point PMI tracks log2(c12*T/(c1*c2)) within the
    composed quantization bound (4 terms x 0.0225 bits)."""
    import math

    from streaminglens_spark.functions.lm import pmi_collocations

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = pmi_collocations(docs, min_count=5, k=20).collect()
    assert rows
    # recompute exact counts in python for the checked pairs
    from collections import Counter

    c12, c1, c2 = Counter(), Counter(), Counter()
    for r in docs.collect():
        toks = r["text"].split(" ")
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
            c2[b] += 1
    t = sum(c12.values())
    for r in rows:
        pair = (r["w1"], r["w2"])
        want = math.log2(c12[pair] * t / (c1[r["w1"]] * c2[r["w2"]]))
        assert abs(r["pmi_micro_bits"] / 1e6 - want) < 4 * 0.0225, (pair, want)


# ----------------------------------------------------- train-then-apply LM

def test_apply_surprisal_matches_self_scoring_on_seen_data(spark):
    """Scoring the training corpus against its own persisted model must
    reproduce bigram_surprisal exactly (plus n_unseen == 0)."""
    from streaminglens_spark.functions.lm import (
        apply_surprisal,
        bigram_counts,
        bigram_surprisal,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    model = bigram_counts(docs)
    applied = {r["doc_id"]: r for r in apply_surprisal(docs, model).collect()}
    want = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    assert set(applied) == set(want)
    for d, r in want.items():
        a = applied[d]
        assert a["n_unseen"] == 0
        assert (a["n_bigrams"], a["total_micro_bits"], a["mean_micro_bits"]) == (
            r["n_bigrams"], r["total_micro_bits"], r["mean_micro_bits"]
        )


def test_apply_surprisal_unseen_backoff(spark):
    """Unseen bigrams back off (known context -> add-one floor, novel
    context -> uniform floor) and are counted in n_unseen; novel text
    scores strictly higher than in-model text."""
    from streaminglens_spark.functions.lm import apply_surprisal, bigram_counts

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    model = bigram_counts(train)
    new = spark.createDataFrame(
        [
            (100, "the cat sat"),        # fully in-model
            (101, "the zebra runs"),     # known context 'the', unseen pair
            (102, "qq ww ee"),           # fully novel
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in apply_surprisal(new, model).collect()}
    assert out[100]["n_unseen"] == 0
    assert out[101]["n_unseen"] == 2  # 'the zebra' and 'zebra runs'
    assert out[102]["n_unseen"] == 2
    assert (
        out[100]["mean_micro_bits"]
        < out[101]["mean_micro_bits"]
    )
    assert out[101]["mean_micro_bits"] <= out[102]["mean_micro_bits"] + 10**6
