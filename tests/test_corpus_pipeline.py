"""End-to-end corpus pipeline: stage-effect assertions (chrome stripped,
PII redacted, duplicates elect one keeper, quality gate applied) and the
fused-plan shuffle bound.  The one-hash-covers-everything check runs in
``test_oracle_queries`` (`q_corpus_pipeline`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.corpus import corpus_pipeline
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_duplicates_elect_single_keeper(spark):
    """Two byte-identical docs after cleanup: exactly one final_keep."""
    base = _docs(spark).limit(30)
    dup = base.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    out = {r["doc_id"]: r for r in corpus_pipeline(base.unionByName(dup)).collect()}
    for i in [r["doc_id"] for r in base.collect()]:
        a, b = out[i], out[i + 1000]
        assert a["clean_md5"] == b["clean_md5"]
        assert a["keep_id"] == b["keep_id"] == i
        assert not b["final_keep"]  # the shifted copy always loses
        assert a["final_keep"] == (a["keep_quality"] and a["n_kept"] > 0)


def test_chrome_and_pii_fall_out(spark):
    """Chrome lines injected into every even doc must be stripped (their
    text never reaches the cleaned hash), and an injected email must be
    redacted -- asserted by comparing against a pipeline run WITHOUT the
    corresponding stage input."""
    from streaminglens_spark.functions.text import boilerplate_corpus, pii_corpus

    base = _docs(spark)
    with_chrome = {r["doc_id"]: r for r in
                   corpus_pipeline(boilerplate_corpus(base)).collect()}
    plain = {r["doc_id"]: r for r in corpus_pipeline(base).collect()}
    stripped_some = 0
    for i, r in with_chrome.items():
        # chrome adds lines to n_lines but the frequent ones are stripped:
        # the cleaned text equals the plain doc's cleaned text
        if r["n_lines"] > plain[i]["n_lines"]:
            stripped_some += 1
            assert r["clean_md5"] == plain[i]["clean_md5"], i
    assert stripped_some > 0
    with_pii = {r["doc_id"]: r for r in
                corpus_pipeline(pii_corpus(base)).collect()}
    # docs gaining ONLY an email (% 3 but not % 5 / % 7): the unique
    # address collapses to the fixed '<EMAIL>' tag, so the cleaned
    # length is EXACTLY plain + len(' contact <EMAIL>') -- the raw
    # (longer, id-bearing) address cannot have survived
    checked = 0
    for i in with_pii:
        if i % 3 == 0 and i % 5 != 0 and i % 7 != 0:
            checked += 1
            assert with_pii[i]["clean_len"] == plain[i]["clean_len"] + len(
                " contact <EMAIL>"
            ), i
    assert checked > 0


def test_empty_after_strip_not_kept(spark):
    """A doc whose every line is boilerplate survives with empty text and
    must never be final_keep (n_kept == 0 guard)."""
    rows = [(i, "identical chrome line") for i in range(40)] + [
        (100, "unique content line one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus_pipeline(df).collect()}
    for i in range(40):
        assert out[i]["n_kept"] == 0
        assert not out[i]["final_keep"]
    assert out[100]["n_kept"] == 1


def test_fused_plan_shuffle_bound(spark):
    """The composition must stay fused: a bounded number of exchanges
    end to end (boilerplate count + reassembly + md5 keeper + the final
    joins), not one per stage re-materialization."""
    plan = (
        corpus_pipeline(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # data shuffles: lines groupBy, reassembly groupBy, spine join
    # alignment, md5-keeper window; plus ONE SinglePartition exchange for
    # the O(1)-row n_docs count.  Broadcast exchanges move bounded
    # relations and don't count against this.  A regression that
    # duplicates the boilerplate subtree (e.g. a keeper self-join) blows
    # straight past this bound (measured 13 for the join formulation).
    shuffles = plan.count("Exchange hashpartitioning")
    assert shuffles <= 5, shuffles
    assert plan.count("Exchange SinglePartition") <= 1
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


# ------------------------------------------- v2: span stage composed in


def test_v2_span_stage_cuts_only_the_loser(spark):
    """A 16-token passage (long enough for >=2 shared winnowing
    minimizers, the min_shared=2 candidate bar) shared INSIDE two otherwise-distinct lines
    (so the boilerplate pass can't touch it) is cut from the higher
    doc_id only; the keeper's text and the bystander doc pass through
    with zero tokens removed."""
    from streaminglens_spark.functions.corpus import corpus_pipeline_v2

    shared = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lam mu nu xi omicron pi")
    docs = spark.createDataFrame(
        [
            (1, "prefix one two three " + shared),
            (2, shared + " suffix four five six"),
            (3, "totally unrelated words with no overlap at all"),
        ]
        + [(10 + i, f"filler doc number {i} keeps the line frequencies low")
           for i in range(8)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r
            for r in corpus_pipeline_v2(docs, min_doc_frac=0.5).collect()}
    assert rows[1]["n_removed"] == 0
    assert rows[3]["n_removed"] == 0
    assert rows[2]["n_removed"] == 16  # the shared span, exactly
    # accounting holds: clean_len shrank on the loser only
    assert rows[2]["clean_len"] < rows[1]["clean_len"]


def test_v2_no_spans_matches_v1_digests(spark):
    """On a corpus with no shared spans the span stage is a no-op modulo
    the split/join round-trip: v2's clean_md5 must equal v1's for every
    single-line doc (split-on-space + join-with-space is the identity)."""
    from streaminglens_spark.functions.corpus import corpus_pipeline_v2

    docs = spark.createDataFrame(
        [(i, f"doc {i} has its very own distinct words w{i}a w{i}b w{i}c")
         for i in range(6)],
        "doc_id long, text string",
    )
    v1 = {r["doc_id"]: r["clean_md5"]
          for r in corpus_pipeline(docs, min_doc_frac=0.5).collect()}
    v2 = {r["doc_id"]: r["clean_md5"]
          for r in corpus_pipeline_v2(docs, min_doc_frac=0.5).collect()}
    assert v1 == v2


def test_v2_plan_bounds(spark):
    """r8 shuffle pin for the six-stage chain: the boilerplate subtree is
    persisted (it feeds the candidate, both gram sides and the rebuild --
    InMemoryTableScan must appear, so the 5-shuffle v1 prefix runs ONCE),
    and everything above the cache stays within the documented span-stage
    shape: 20 hash exchanges (winnow fingerprints + pair join + two gram
    joins + diagonal windows + interval merge + rebuild join + md5
    keeper), no Python anywhere, no cartesian product."""
    from streaminglens_spark.functions.corpus import corpus_pipeline_v2
    from streaminglens_spark.plans.audit import exchange_count, formatted_plan

    df = corpus_pipeline_v2(_docs(spark))
    plan = formatted_plan(df)
    assert "InMemoryTableScan" in plan, "boilerplate table must be persisted"
    assert exchange_count(df) <= 20, exchange_count(df)
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan
