"""Bloom-filter semi-join pruning (round-4 north-star extension).

The reference never joins large fact data at all (its state is driver-local
maps -- `QueryInsightsManager.scala` holds per-query ring buffers); at
100 TB the canonical "filter a huge fact table by a key set" problem is
shuffle-bound, and the standard fix is a Bloom filter built from the key
side and pushed to the fact scan as a MAP-ONLY predicate:

- the big side never shuffles to discover non-matches: rows failing the
  filter die at the scan (in a real deployment, inside the same stage as
  the parquet scan, before any exchange);
- the filter itself is tiny and bounded: ``m`` bits packed into ``m/32``
  integer words, collected driver-side (same bounded-collect class as the
  k-means centroids -- O(m/32) = 256 values, documented) and shipped as a
  LITERAL array expression, so membership is pure whole-stage-codegen
  integer arithmetic, no join node at all;
- false positives are killed by the exact join that follows, so the
  end-to-end result is EXACTLY the semi-join (Bloom filters have no false
  negatives -- every true match sets all its bits); the filter only
  changes how much data reaches the join.

Determinism: bit positions come from ``k`` affine hashes
``((A_i * key + B_i) mod P) mod m`` -- plain integer arithmetic the DuckDB
oracle does not need to reproduce (the oracle checks the exact semi-join
RESULT; the Bloom stage is result-invariant by construction, and its
no-false-negative property is pinned separately by tests).

Spark note: Spark's own AQE injects runtime bloom filters
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) for shuffle joins; this
operator is the EXPLICIT form -- usable where AQE can't see the
opportunity (pre-filtering before a non-join consumer, reusing one filter
across many queries, streaming micro-batches against a static key set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_P = 2_147_483_647

BLOOM_M = 8192  # bits
BLOOM_K = 3     # hashes per key
BLOOM_A = (2_654_435_761, 2_246_822_519, 3_266_489_917)
BLOOM_B = (104_729, 94_007, 15_485_863)

_WORD_BITS = 32


def _bit_positions(key: F.Column, m: int) -> list[F.Column]:
    return [
        ((F.lit(BLOOM_A[i]) * key + F.lit(BLOOM_B[i])) % F.lit(HASH_P)) % F.lit(m)
        for i in range(BLOOM_K)
    ]


def build_bloom(keys: DataFrame, key: str, m: int = BLOOM_M) -> list[int]:
    """Build the filter from the key side: returns the packed bit array as
    ``m / 32`` integer words.  One explode (k rows per key) + one groupBy
    ``bit_or`` -- both partial-aggregated map-side, shuffled volume
    O(partitions * m/32).  The collect is bounded at m/32 words regardless
    of key count (the k-means-centroid collect class)."""
    pos = keys.select(
        F.explode(F.array(*_bit_positions(F.col(key), m))).alias("p")
    )
    words = (
        pos.groupBy(F.expr(f"p div {_WORD_BITS}").alias("w"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(cast(1 as bigint), cast(p % {_WORD_BITS} as int))")
            ).alias("bits")
        )
        .collect()
    )
    packed = [0] * (m // _WORD_BITS)
    for row in words:
        packed[row["w"]] = row["bits"]
    return packed


def bloom_member(key: F.Column, words: list[int], m: int = BLOOM_M) -> F.Column:
    """Membership predicate against a built filter: true iff ALL k bit
    positions are set.  The words ship as a literal array, so this is
    whole-stage-codegen integer arithmetic -- no join, no shuffle, no
    Python."""
    arr = F.array(*[F.lit(int(x)).cast("long") for x in words])
    # shiftleft needs a literal bit count; a 32-entry literal mask table
    # indexed by (p mod 32) keeps the whole predicate codegen-able
    masks = F.array(*[F.lit(1 << j).cast("long") for j in range(_WORD_BITS)])
    cond = None
    for p in _bit_positions(key, m):
        word = F.element_at(arr, (p / F.lit(_WORD_BITS)).cast("int") + 1)
        mask = F.element_at(masks, (p % F.lit(_WORD_BITS)).cast("int") + 1)
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m: int = BLOOM_M,
) -> DataFrame:
    """Semi-join ``big`` to ``small``'s key set with a Bloom prune first.
    Result is EXACTLY ``big LEFT SEMI JOIN small`` (the exact join after
    the prune kills false positives; no false negatives exist).  At fixture
    scale the final join broadcasts; at 100 TB with an un-broadcastable key
    set it shuffles -- and the prune has already cut the shuffled fact
    volume to (selectivity + fp_rate) of the input, the entire point."""
    words = build_bloom(small.select(small_key).distinct(), small_key, m)
    pruned = big.filter(bloom_member(F.col(big_key), words, m))
    keyset = small.select(F.col(small_key).alias(big_key)).distinct()
    return pruned.join(F.broadcast(keyset), big_key, "left_semi")


def orders_from_segment(
    orders: DataFrame, customer: DataFrame, segment: str = "BUILDING"
) -> DataFrame:
    """Fixture binding: orders placed by customers in a market segment --
    the classic selective-dimension fact prune.  Returns (o_orderkey,
    o_custkey, price_cents)."""
    seg = customer.filter(F.col("c_mktsegment") == segment)
    return bloom_semi_join(orders, seg, "o_custkey", "c_custkey").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
