"""Distinct-text MinHash probe (r15, r14 verdict ask #9).

``minhash_lsh_pairs``'s docstring carries the cluster-scale claim "at
scale: hash distinct content, join back" -- on a duplicated web corpus
the shingle/MinHash UDF should run once per DISTINCT text, not once per
row, with copies inheriting their original's signature through the md5
class table the operator already builds.  The local fixtures cannot
measure this (sf1: 49,992 distinct of 50,000 texts -- no duplication),
so this probe SYNTHESIZES the duplicated corpus: the first
``n_base`` sf1 documents replicated ``dup_factor``x under fresh ids.

Two timed variants over the same corpus (interleaved in one session,
min of ``runs``, noop sink -- the bench protocol):

- ``current``: ``minhash_lsh_pairs`` as shipped (hashes every row; md5
  classes formed after the UDF);
- ``distinct_first``: the same operator fed one REPRESENTATIVE row per
  distinct md5, its pair output expanded back to member level through
  the class table -- pair-for-pair identical output by the operator's
  own class semantics (copies share their original's shingle set), with
  the UDF paying 1/dup_factor of the hashing.  The probe VERIFIES the
  two variants' sorted pair sets hash-identically before timing.

Writes probe_distinct_minhash.json with the go/no-go.

Usage: python scripts/probe_distinct_minhash.py [sf1_dir] [dup_factor]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from streaminglens_spark.cache import release_caches  # noqa: E402
from streaminglens_spark.session import get_spark  # noqa: E402
from streaminglens_spark.sources.loaders import load_table  # noqa: E402
from streaminglens_spark.functions.dedup import (  # noqa: E402
    DUP_SHIFT,
    minhash_lsh_pairs,
)

N_BASE = 10_000
ID_STRIDE = 20_000  # replica k gets doc_id + k * ID_STRIDE (all < DUP_SHIFT)


def build_corpus(spark, sf_dir: str, dup_factor: int):
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < N_BASE)
    )
    parts = [base]
    for k in range(1, dup_factor):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(k * ID_STRIDE)).alias("doc_id"),
                "text",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def distinct_first_pairs(documents, threshold: float = 0.5):
    """The docstring's scale shape: run the shipped operator over one
    REPRESENTATIVE per distinct text, then rebuild its member-level tail
    (keeper star over real members + their ``+DUP_SHIFT`` shadows, and
    cross-class expansion through the same membership table) -- copies
    share their original's shingle set, so the pair set is exactly the
    shipped operator's output while the UDF hashes 1/dup_factor of the
    rows.  The rep-level verified pairs are extracted from the shipped
    operator's output over the (distinct-md5) rep corpus by dropping its
    shadow rows."""
    slim = documents.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("md5_fp")
    )
    classes = slim.groupBy("md5_fp").agg(F.min("doc_id").alias("rep_id"))
    omem = slim.join(classes, "md5_fp").select("rep_id", "doc_id")
    mem = omem.unionByName(
        omem.withColumn("doc_id", F.col("doc_id") + DUP_SHIFT)
    )
    reps = documents.join(
        classes.select(F.col("rep_id").alias("doc_id")), "doc_id"
    )
    # reps have pairwise-distinct md5s, so the operator's own classes are
    # singletons there: rows with both ids real ARE the rep-level pairs
    rep_pairs = minhash_lsh_pairs(reps, threshold).filter(
        (F.col("doc_a") < DUP_SHIFT) & (F.col("doc_b") < DUP_SHIFT)
    )
    xa = mem.select(F.col("rep_id").alias("doc_a"), F.col("doc_id").alias("m_a"))
    xb = mem.select(F.col("rep_id").alias("doc_b"), F.col("doc_id").alias("m_b"))
    cross = (
        rep_pairs.join(xa, "doc_a")
        .join(xb, "doc_b")
        .select(
            F.least("m_a", "m_b").alias("doc_a"),
            F.greatest("m_a", "m_b").alias("doc_b"),
            "jaccard",
        )
    )
    star = mem.filter(F.col("doc_id") != F.col("rep_id")).select(
        F.col("rep_id").alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    return star.unionByName(cross)


def pairs_digest(df) -> str:
    return df.select(
        F.md5(
            F.concat_ws(
                ";",
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(
                            ":",
                            F.col("doc_a").cast("string"),
                            F.col("doc_b").cast("string"),
                            F.round("jaccard", 6).cast("string"),
                        )
                    )
                ),
            ).cast("binary")
        ).alias("d")
    ).first()["d"]


def main() -> None:
    import bench

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    dup_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    runs = 3
    spark = get_spark("probe-distinct-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(spark, sf_dir, dup_factor).localCheckpoint()

    # correctness first: identical pair sets (value-hashed)
    d_cur = pairs_digest(minhash_lsh_pairs(corpus))
    release_caches(); spark.catalog.clearCache()
    d_dst = pairs_digest(distinct_first_pairs(corpus))
    release_caches(); spark.catalog.clearCache()

    variants = {
        "current": lambda: minhash_lsh_pairs(corpus),
        "distinct_first": lambda: distinct_first_pairs(corpus),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(runs):  # interleave variants within each round
        for name, fn in variants.items():
            release_caches()
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    best = {k: min(v) for k, v in times.items()}
    speedup = round(best["current"] / best["distinct_first"], 3)
    out = {
        "sf_dir": sf_dir,
        "n_base": N_BASE,
        "dup_factor": dup_factor,
        "rows": N_BASE * dup_factor,
        "pairs_digest_match": d_cur == d_dst,
        "best_sec": best,
        "spread": times,
        "speedup_distinct_first": speedup,
        "go": bool(d_cur == d_dst and speedup >= 1.3),
        "env": bench._env_probe(),
    }
    Path("probe_distinct_minhash.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
