"""r11 extensions: cross-document line dedup (first-occurrence keeper,
no content-key join) and the multi-phase mixture annealing schedule
(one count aggregate, per-phase temperature allocations)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_line_dedup_first_occurrence_golden(spark):
    """Keeper = earliest (doc_id, pos) corpus-wide: later copies vanish
    across docs AND within a doc; empty lines never count; a doc losing
    every line still emits a row with n_kept=0 and the empty-string
    digest."""
    import hashlib

    from streaminglens_spark.functions.text import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared\nalpha"),      # in-doc dup of 'alpha'
            (2, "shared\nbeta"),              # 'shared' first seen in doc 1
            (3, "shared"),                    # loses its only line
            (4, "\ngamma\n"),                 # empty lines ignored
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    r1 = rows[1]
    assert (r1["n_lines"], r1["n_kept"]) == (3, 2)
    assert r1["clean_md5"] == md5("alpha\nshared")
    r2 = rows[2]
    assert (r2["n_lines"], r2["n_kept"]) == (2, 1)
    assert r2["clean_md5"] == md5("beta")
    r3 = rows[3]
    assert (r3["n_lines"], r3["n_kept"], r3["clean_len"]) == (1, 0, 0)
    assert r3["clean_md5"] == md5("")
    r4 = rows[4]
    assert (r4["n_lines"], r4["n_kept"]) == (1, 1)
    assert r4["clean_md5"] == md5("gamma")


def test_line_dedup_keeps_each_distinct_line_exactly_once(spark):
    """Conservation: sum(n_kept) == number of distinct nonempty lines,
    and rerunning line_dedup on its own kept set is a fixpoint (every
    surviving line is already unique corpus-wide)."""
    from streaminglens_spark.functions.text import boilerplate_corpus, line_dedup

    docs = boilerplate_corpus(
        spark.createDataFrame(
            [(i, f"body {i % 7} text") for i in range(60)],
            "doc_id long, text string",
        )
    )
    out = line_dedup(docs).collect()
    distinct_lines = (
        docs.select(F.explode(F.split("text", "\n")).alias("line"))
        .filter(F.length("line") > 0)
        .distinct()
        .count()
    )
    assert sum(r["n_kept"] for r in out) == distinct_lines


def test_mixture_schedule_anneals_toward_proportional(spark):
    """Per phase: micros sum to exactly 1e6 and targets floor within the
    phase budget; across phases the low-resource stratum's weight share
    DECREASES monotonically as alpha anneals 0.25 -> 0.5 -> 1.0, landing
    exactly on the proportional micro split at alpha=1."""
    from streaminglens_spark.functions.sampling import mixture_schedule

    docs = spark.createDataFrame(
        [(i, "w " * (400 if i < 20 else 10) + "end",
          "big" if i < 20 else "small")
         for i in range(40)],
        "doc_id long, text string, source string",
    )
    phases = [(0, 2, 300_000), (1, 1, 400_000), (2, 0, 300_000)]
    rows = mixture_schedule(docs, phases).collect()
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], {})[r["stratum"]] = r
    assert set(by_phase) == {0, 1, 2}
    budgets = {p: t for p, _, t in phases}
    small_shares = []
    for p, strata in sorted(by_phase.items()):
        micros = {s: r["weight_micro"] for s, r in strata.items()}
        assert sum(micros.values()) == 1_000_000, p
        assert sum(r["target_tokens"] for r in strata.values()) <= budgets[p]
        for r in strata.values():
            assert (
                r["target_tokens"]
                == budgets[p] * r["weight_micro"] // 1_000_000
            )
        small_shares.append(micros["small"])
    assert small_shares[0] > small_shares[1] > small_shares[2]
    # alpha=1 is exactly proportional (in rounded-micro space)
    n = {s: r["n_tokens"] for s, r in by_phase[2].items()}
    total_n = sum(n.values())
    prop_small = round(n["small"] / total_n * 1_000_000)
    assert abs(by_phase[2]["small"]["weight_micro"] - prop_small) <= 1


def test_mixture_schedule_matches_single_phase_operator(spark):
    """Each phase's allocation is bit-identical to running
    temperature_mixture_plan standalone at that (sqrt_steps, budget) --
    the schedule is a pure fan-out of the single-phase operator."""
    from streaminglens_spark.functions.sampling import (
        mixture_schedule,
        temperature_mixture_plan,
    )

    docs = spark.createDataFrame(
        [(i, "tok " * (30 + (i % 11) * 7), f"s{i % 5}")
         for i in range(50)],
        "doc_id long, text string, source string",
    )
    phases = [(0, 2, 123_456), (1, 1, 777_777)]
    sched = {
        (r["phase"], r["stratum"]): (r["weight_micro"], r["target_tokens"])
        for r in mixture_schedule(docs, phases).collect()
    }
    for phase_id, steps, tokens in phases:
        solo = {
            r["stratum"]: (r["weight_micro"], r["target_tokens"])
            for r in temperature_mixture_plan(
                docs, tokens, sqrt_steps=steps
            ).collect()
        }
        for s, v in solo.items():
            assert sched[(phase_id, s)] == v


def test_dedup_stats_conservation(spark):
    """sum(n_docs) over the histogram equals the dup-corpus size;
    sum(n_clusters) equals the post-dedup (one-keeper-per-cluster)
    corpus size, which for an exact-copy corpus equals the exact-dedup
    keeper count."""
    from streaminglens_spark import cache
    from streaminglens_spark.functions.dedup import dedup_exact, dedup_stats

    # mutually DISSIMILAR texts (id-derived token soup, distinct shingle
    # sets) so the only near-dups are the dup_corpus exact copies
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + k * 13) % 97}x{(i + k) % 11}"
                      for k in range(20)))
         for i in range(30)],
        "doc_id long, text string",
    )
    try:
        rows = dedup_stats(docs).collect()
    finally:
        cache.release_caches()
    assert sum(r["n_docs"] for r in rows) == 60  # dup_corpus = 2x docs
    keepers = dedup_exact(docs).count()
    assert sum(r["n_clusters"] for r in rows) == keepers
    # the injected corpus pairs every doc with its shifted copy: the
    # histogram is exactly one size-2 bucket
    assert {(r["cluster_size"], r["n_clusters"]) for r in rows} == {(2, 30)}


def test_shard_balance_round_robin_invariants(spark):
    """Doc counts across shards differ by at most 1 (round-robin), token
    totals conserve the corpus, and shard ids are dense 0..n-1."""
    from streaminglens_spark.functions.sampling import shard_balance

    docs = spark.createDataFrame(
        [(i, "w " * (5 + i % 17) + "end") for i in range(200)],
        "doc_id long, text string",
    )
    rows = shard_balance(docs, n_shards=8).collect()
    assert sorted(r["shard"] for r in rows) == list(range(8))
    counts = [r["n_docs"] for r in rows]
    assert max(counts) - min(counts) <= 1 and sum(counts) == 200
    total_tokens = sum(6 + i % 17 for i in range(200))
    assert sum(r["n_tokens"] for r in rows) == total_tokens


def test_seq_length_audit_invariants(spark):
    """Per candidate length: tokens_lost + tokens_kept conserve the
    corpus token total; losses are monotone non-increasing in seq_len;
    a candidate above every doc length truncates nothing; invalid
    candidates raise."""
    import pytest

    from streaminglens_spark.functions.sampling import seq_length_audit

    docs = spark.createDataFrame(
        [(i, "w " * (10 + 30 * (i % 4)) + "end") for i in range(40)],
        "doc_id long, text string",
    )
    total = sum(11 + 30 * (i % 4) for i in range(40))
    rows = {r["seq_len"]: r for r in
            seq_length_audit(docs, [16, 64, 1024]).collect()}
    assert set(rows) == {16, 64, 1024}
    for r in rows.values():
        assert r["tokens_lost"] + r["tokens_kept"] == total
    losses = [rows[x]["tokens_lost"] for x in (16, 64, 1024)]
    assert losses[0] >= losses[1] >= losses[2]
    assert rows[1024]["n_docs_truncated"] == 0
    assert rows[1024]["tokens_lost"] == 0
    # docs with i%4==0 have 11 tokens (< 16): the other 30 truncate at 16
    assert rows[16]["n_docs_truncated"] == 30
    with pytest.raises(ValueError):
        seq_length_audit(docs, [0])
