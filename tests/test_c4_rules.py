"""C4-style rule filter (r12): value parity vs the DuckDB oracle runs
in the two-SF sweep (test_oracle_queries); this file pins hand-computed
goldens for each rule, the line-filter composition, and the zero-
exchange map-only plan."""

from __future__ import annotations

import hashlib

from streaminglens_spark import registry
from streaminglens_spark.functions.text import c4_corpus, c4_rules
from streaminglens_spark.plans.audit import exchange_count, python_udf_count

from .conftest import SF_DIR


def _rules(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_rules(df).collect()}


def test_line_rules_golden(spark):
    """Each line rule in isolation: short line dropped, unpunctuated
    line dropped, javascript line dropped, good line kept."""
    page = "\n".join(
        [
            "One two three four five six.",  # kept
            "Too short here.",               # < 5 words
            "this line has no terminal punctuation at all",
            "Please enable JavaScript to see this content.",
            "Another good sentence with enough words stands!",
        ]
    )
    out = _rules(spark, [(1, page)])[1]
    assert out["n_lines"] == 5
    assert out["n_kept_lines"] == 2
    assert out["n_sentences"] == 2
    kept = "One two three four five six.\nAnother good sentence with enough words stands!"
    assert out["clean_md5"] == hashlib.md5(kept.encode()).hexdigest()
    assert not out["r_sentences"] and not out["keep"]  # 2 < 3 sentences


def test_page_rules_golden(spark):
    """Page-level vetoes fire on the RAW page even when every line is
    individually clean; three sentences satisfy the floor."""
    good = (
        "One two three four five six.\n"
        "Seven eight nine ten eleven twelve!\n"
        "Thirteen fourteen fifteen sixteen seventeen?"
    )
    out = _rules(
        spark,
        [
            (1, good),
            (2, good + "\nthey wrote Lorem Ipsum dolor sit amet here."),
            (3, good + "\nvar x = { a: 1 };"),
        ],
    )
    assert out[1]["keep"] and out[1]["r_lorem"] and out[1]["r_brace"]
    assert out[1]["n_sentences"] == 3
    assert not out[2]["r_lorem"] and not out[2]["keep"]
    assert not out[3]["r_brace"] and not out[3]["keep"]


def test_multi_sentence_lines_count_each_terminal(spark):
    """The sentence floor counts terminals across kept lines, not kept
    lines themselves -- one long kept line with three sentences passes."""
    page = "First part here now. Second part too! Third part question five?"
    out = _rules(spark, [(1, page)])[1]
    assert out["n_kept_lines"] == 1
    assert out["n_sentences"] == 3
    assert out["keep"]


def test_corpus_injection_mix(spark):
    """Over the fixture corpus every rule must actually fire somewhere
    and somewhere not -- the injection keeps the verdict space covered."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = c4_rules(c4_corpus(docs)).collect()
    for col in ("r_sentences", "r_lorem", "r_brace", "keep"):
        vals = {bool(r[col]) for r in rows}
        assert vals == {True, False}, f"{col} never varies"


def test_plan_is_map_only(spark):
    """Filtering is a scan: zero exchanges, zero Python UDFs."""
    df = registry.q_c4_rules(spark, SF_DIR)
    assert exchange_count(df) == 0
    assert python_udf_count(df) == 0
