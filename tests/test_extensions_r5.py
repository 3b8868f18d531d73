"""Round-5 extensions: hashed linear quality classifier and
sliding-window document chunking.  Oracle hash-equality runs in
test_oracle_queries (LOCAL_ORACLE); this file pins goldens, edge cases
and the zero-shuffle plan shapes."""

from __future__ import annotations

import hashlib

from streaminglens_spark.functions.text import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    HASH_MOD,
    QC_DIM,
    chunk_documents,
    qc_weights,
    quality_classifier,
)
from streaminglens_spark.plans.audit import formatted_plan


def _fold(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


# ------------------------------------------------------- quality_classifier

def test_quality_classifier_matches_python_reference(spark):
    w = qc_weights()
    texts = ["the quick brown fox", "spam", "a a a a a"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        feats = [_fold(tok) % QC_DIM for tok in toks] + [
            _fold(f"{a}_{b}") % QC_DIM for a, b in zip(toks, toks[1:])
        ]
        score = sum(w[b] for b in feats)
        r = got[i]
        assert r["n_feats"] == len(feats)
        assert r["score_milli"] == score
        assert r["keep"] == (score >= 0)


def test_quality_classifier_single_token_no_bigrams(spark):
    # F.sequence(1, 0) would yield a DESCENDING [1, 0]; the guard must
    # keep single-token docs at exactly one (unigram) feature
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    r = quality_classifier(df).collect()[0]
    assert r["n_feats"] == 1
    assert r["score_milli"] == qc_weights()[_fold("hello") % QC_DIM]


def test_quality_classifier_zero_shuffle(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = formatted_plan(quality_classifier(df.select("doc_id", "text")))
    assert "Exchange" not in plan, "scoring must be a map-only scan"
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------- chunk_documents

def test_chunk_boundaries_and_overlap(spark):
    n = 113  # 3 chunks: starts 0, 48, 96
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(df).collect(), key=lambda r: r["chunk_idx"])
    assert [(r["start_tok"], r["n_toks"]) for r in rows] == [
        (0, CHUNK_TOKENS),
        (CHUNK_STRIDE, CHUNK_TOKENS),
        (2 * CHUNK_STRIDE, n - 2 * CHUNK_STRIDE),
    ]
    # md5 identity: chunk k hashes exactly tokens [start, start+n_toks)
    toks = text.split(" ")
    for r in rows:
        expect = " ".join(toks[r["start_tok"] : r["start_tok"] + r["n_toks"]])
        assert r["chunk_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_documents(df).collect()
    assert len(rows) == 1
    assert (rows[0]["start_tok"], rows[0]["n_toks"]) == (0, 3)


def test_chunk_full_coverage_on_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs.select("doc_id", "text")).collect()
    per_doc: dict[int, list] = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    lens = {r["doc_id"]: len(r["text"].split(" ")) for r in docs.collect()}
    assert set(per_doc) == set(lens)  # every doc chunks (>= 1 each)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        # stride spacing, tail reaches the last token, overlap constant
        for i, r in enumerate(rows):
            assert r["start_tok"] == i * CHUNK_STRIDE
        last = rows[-1]
        assert last["start_tok"] + last["n_toks"] == lens[doc_id]


def test_chunk_no_shuffle(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = formatted_plan(chunk_documents(df.select("doc_id", "text")))
    assert "Exchange" not in plan, "chunking must not shuffle the corpus"


def test_vocab_topk_invariants(spark):
    """Exact counts, deterministic tie-break (count desc, token asc),
    monotone cumulative coverage ending <= total."""
    from streaminglens_spark.functions.text import vocab_topk

    df = spark.createDataFrame(
        [(1, "b a a c b a"), (2, "c b x")], "doc_id long, text string"
    )
    rows = sorted(vocab_topk(df, k=3).collect(), key=lambda r: r["rank"])
    assert [(r["token"], r["cnt"]) for r in rows] == [("a", 3), ("b", 3), ("c", 2)]
    assert [r["cum_count"] for r in rows] == [3, 6, 8]
    assert all(r["total_count"] == 9 for r in rows)
