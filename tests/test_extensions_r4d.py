"""Round-4d pretraining-loader extensions: benchmark decontamination,
concat-and-chunk sequence packing, signed random projection.

Oracle hash-equality at sf0.001 runs in test_oracle_queries (LOCAL_ORACLE);
this file pins hand-computed goldens, edge cases, and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.similarity import (
    RP_IN_DIM,
    RP_OUT_DIM,
    random_project,
    rp_signs,
)
from streaminglens_spark.functions.text import (
    decontaminate,
    pack_sequences,
)
from streaminglens_spark.plans.audit import (
    exchange_count,
    python_udf_count,
    uses_broadcast_join,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ----------------------------------------------------------- decontaminate

def test_decontaminate_golden(spark):
    # doc 0 is the benchmark (0 % 17 == 0); doc 1 shares 2 of its 3
    # trigrams with it; doc 2 shares none; doc 3 is too short to shingle
    rows = [
        (0, "the quick brown fox jumps"),
        (1, "the quick brown fox leaps"),
        (2, "totally different text here now"),
        (3, "too short"),
    ]
    out = {r["doc_id"]: r for r in decontaminate(_docs(spark, rows)).collect()}
    assert 0 not in out  # benchmark docs are not scored
    assert out[1]["n_shingles"] == 3
    assert out[1]["n_hits"] == 2  # 'the quick brown', 'quick brown fox'
    assert out[1]["contam_frac"] == round(2 / 3, 6)
    assert out[1]["flagged"] is True
    assert out[2]["n_hits"] == 0 and out[2]["flagged"] is False
    assert out[3]["n_shingles"] == 0
    assert out[3]["contam_frac"] == 0.0 and out[3]["flagged"] is False


def test_decontaminate_counts_distinct_trigrams_once(spark):
    # a repeated trigram in the training doc counts once (distinct set)
    rows = [(0, "a b c"), (1, "a b c a b c")]
    out = decontaminate(_docs(spark, rows)).collect()[0]
    # doc 1 trigrams: {a b c, b c a, c a b} -> only 'a b c' hits
    assert out["n_shingles"] == 3 and out["n_hits"] == 1


def test_decontaminate_benchmark_side_is_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = decontaminate(docs)
    assert uses_broadcast_join(df)
    assert python_udf_count(df) == 0


def test_decontaminate_fixture_flags_dup_groups(spark):
    # the fixture corpus has near-dup groups, so some training docs must
    # collide with the % 17 benchmark slice
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = decontaminate(docs)
    assert out.filter(F.col("flagged")).count() > 0
    n_docs = docs.count()
    n_bench = docs.filter(F.col("doc_id") % 17 == 0).count()
    assert out.count() == n_docs - n_bench


# ---------------------------------------------------------- pack_sequences

def test_pack_sequences_golden(spark):
    # seq_len=10, 2 shards: shard 0 gets docs 0 (4 toks), 2 (8), 4 (3)
    rows = [
        (0, "a b c d"),
        (1, "x " * 5),          # shard 1, 6 tokens (trailing empty token)
        (2, "e f g h i j k l"),
        (4, "m n o"),
    ]
    out = {
        r["doc_id"]: r
        for r in pack_sequences(_docs(spark, rows), seq_len=10, n_shards=2).collect()
    }
    assert (out[0]["shard"], out[0]["token_offset"]) == (0, 0)
    assert (out[0]["first_seq"], out[0]["last_seq"], out[0]["n_seqs"]) == (0, 0, 1)
    # doc 2: offset 4, tokens 8 -> spans [4, 11] -> sequences 0 and 1
    assert out[2]["token_offset"] == 4
    assert (out[2]["first_seq"], out[2]["last_seq"], out[2]["n_seqs"]) == (0, 1, 2)
    # doc 4: offset 12 -> entirely inside sequence 1
    assert out[4]["token_offset"] == 12
    assert (out[4]["first_seq"], out[4]["last_seq"], out[4]["n_seqs"]) == (1, 1, 1)
    # shard 1 stream is independent: doc 1 starts at offset 0
    assert (out[1]["shard"], out[1]["token_offset"]) == (1, 0)


def test_pack_sequences_offsets_are_contiguous_per_shard(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(docs)
    check = packed.groupBy("shard").agg(
        F.min("token_offset").alias("lo"),
        F.max(F.col("token_offset") + F.col("n_tokens")).alias("end"),
        F.sum("n_tokens").alias("total"),
    )
    for r in check.collect():
        assert r["lo"] == 0
        assert r["end"] == r["total"]  # no gaps, no overlaps


def test_pack_sequences_bounded_shuffles(spark):
    # r8 two-level: bucket-sum groupBy + the tiny per-shard offset window
    # + the (shard, bucket) row window -- and NEVER a full-shard row
    # window (the r4 single-window form put 1/n_shards of the corpus on
    # one reducer)
    import re

    from streaminglens_spark.plans.audit import formatted_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = pack_sequences(docs)
    assert exchange_count(df) <= 3
    specs = re.findall(r"windowspecdefinition\([^)]*", formatted_plan(df))
    assert not any(
        re.match(r"windowspecdefinition\(shard#\d+, doc_id#", s)
        for s in specs
    ), f"full-shard row window reintroduced: {specs}"


# ---------------------------------------------------------- random_project

def test_random_project_golden_unit_vectors(spark):
    # e_j projects to exactly the j-th column of the sign matrix
    signs = rp_signs()
    rows = [
        (j, [1.0 if i == j else 0.0 for i in range(RP_IN_DIM)], 0)
        for j in (0, 13, 63)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["vec_id"]: r for r in random_project(emb).collect()}
    for j in (0, 13, 63):
        for k in range(RP_OUT_DIM):
            assert out[j][f"p{k}"] == signs[k][j]
    # srp_sig packs the positive components
    want = sum(1 << k for k in range(RP_OUT_DIM) if signs[k][0] > 0)
    assert out[0]["srp_sig"] == want


def test_random_project_signs_are_balanced():
    # the sign rows must not be degenerate (all-equal or heavily skewed
    # rows would make projections trivially correlated)
    for row in rp_signs():
        pos = sum(1 for s in row if s > 0)
        assert 16 <= pos <= 48, row


def test_random_project_is_map_only(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = random_project(emb)
    assert exchange_count(df) == 0
    assert python_udf_count(df) == 0


def test_random_project_preserves_norms_in_expectation(spark):
    # the JL/sign-projection guarantee that IS testable on this fixture
    # (whose pairwise distances concentrate too tightly for ordering
    # checks): E[|Px|^2 / out_dim] = |x|^2.  The corpus-mean ratio must
    # sit near 1; measured 1.005 at sf0.001.
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    proj = random_project(emb)
    proj_n2 = sum(F.col(f"p{k}") * F.col(f"p{k}") for k in range(RP_OUT_DIM))
    orig_n2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    ratio = (
        proj.join(emb, "vec_id")
        .select(((proj_n2 / RP_OUT_DIM) / orig_n2).alias("r"))
        .agg(F.avg("r"))
        .collect()[0][0]
    )
    assert 0.85 <= ratio <= 1.15, ratio


def test_sequence_manifest_inverts_packing(spark):
    """r8: the manifest is the exact inverse view -- every sequence except
    each shard's last is exactly full, and per-doc fill sums reproduce
    pack_sequences' token counts."""
    from streaminglens_spark.functions.text import (
        PACK_SEQ_LEN,
        sequence_manifest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = sequence_manifest(docs)
    rows = m.collect()
    last = {}
    for r in rows:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["seq_id"])
    for r in rows:
        if r["seq_id"] != last[r["shard"]]:
            assert r["filled"] == PACK_SEQ_LEN, r
        else:
            assert 0 < r["filled"] <= PACK_SEQ_LEN
    # total filled tokens == total corpus tokens (raw-split convention)
    total = sum(r["filled"] for r in rows)
    want = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")).collect()[0]["t"]
    assert total == want
