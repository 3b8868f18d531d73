"""Recall property for the MinHash staging contract (round-2 advice /
round-2 verdict ask #7): the estimate prefilter is the ONLY approximation
left in ``minhash_lsh_pairs`` -- pin its recall as a number against the
r1-style exact-verify pipeline (``est_margin=1.0`` disables the prefilter;
the md5 shortcut is provably exact so both pipelines emit exact values).

Corpus: synthetic pairs with a controlled spread of prefix overlap (plus the
operator's built-in exact +100000 copies), so truth pairs cover J = 1.0 down
through the 0.5 threshold.
"""

from __future__ import annotations

import random

from streaminglens_spark.functions.dedup import minhash_lsh_pairs

THRESHOLD = 0.5


def _synthetic_docs(spark):
    rng = random.Random(7)
    word = lambda: "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(5))  # noqa: E731
    rows = []
    fracs = [1.0, 0.95, 0.9, 0.8, 0.7, 0.6]
    for i in range(30):
        base = [word() for _ in range(80)]
        keep = int(fracs[i % len(fracs)] * 80)
        other = base[:keep] + [word() for _ in range(80 - keep)]
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(other)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefilter_recall_bound_and_exact_agreement(spark):
    docs = _synthetic_docs(spark)
    truth = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, THRESHOLD, est_margin=1.0).collect()
    }
    staged = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, THRESHOLD).collect()
    }
    # staged is a subset of truth with identical values (prefilter only drops)
    for pair, j in staged.items():
        assert truth[pair] == j
    # exact agreement at J = 1: identical texts always survive (md5 shortcut
    # or est=1 verify), never prefiltered
    ones = {p for p, j in truth.items() if j == 1.0}
    assert ones and ones <= set(staged)
    # recall bound clear of the threshold: J >= threshold + 0.1
    clear = {p for p, j in truth.items() if j >= THRESHOLD + 0.1}
    hit = clear & set(staged)
    assert len(clear) >= 20, "fixture must exercise the bound"
    recall = len(hit) / len(clear)
    assert recall >= 0.9, f"prefilter recall {recall:.3f} < 0.9 on {len(clear)} pairs"
