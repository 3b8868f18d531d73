"""Streaming near-duplicate dedup by MinHash band keys (round-3 north-star
extension; VERDICT r2 ask #2).

A 100 TB training-data pipeline ingests continuously, so near-dup dedup
cannot be batch-only.  This operator is the streaming counterpart of
``functions/dedup.py::minhash_lsh_pairs``: each document is shingled and
MinHashed ONCE (the same Arrow-vectorized UDF as the batch path), exploded
into its ``N_BANDS`` band keys, and routed to keyed state per
``(band, band_sig)`` bucket -- exactly the equi-join bucketing that makes
the batch path scale, expressed as Structured Streaming keyed state
(``applyInPandasWithState``, the ``streaming/stateful.py`` pattern).

Per bucket, the state is the list of previously-seen documents' 16-long
signatures + md5 fingerprints (O(1) per doc -- sketches, never shingle
sets or text).  An arriving document is a DUPLICATE if any earlier document
in the bucket matches its signature estimate at >= ``threshold``; the
verdict row carries the matched doc and whether the match is CERTAIN
(full-signature + md5 equality => textually identical, jaccard exactly
1.0 -- the same provably-exact shortcut as the batch operator).

Contract vs the batch operator: the batch path runs an exact-Jaccard
verify on uncertain candidates; a sketch-only stream cannot (the shingle
sets are gone), so uncertain verdicts here are signature-estimate verdicts
-- the standard streaming-LSH tradeoff, equivalent to Spark MinHashLSH's
``approxSimilarityJoin`` estimate.  On a corpus whose duplicates are exact
copies the two paths agree bit-for-bit (both take the certain path); the
real-stream test pins that agreement plus watermark-bounded state.

State TTL: event-time timeout -- each bucket's state expires once the
watermark passes ``last event time + ttl``, so state is bounded by the
stream's recent-window content (A18-style purge, by time instead of
batches).  "Earlier" means arrival order (event-time order within a
micro-batch); the batch operator's ``doc_a < doc_b`` orientation matches
when ids are assigned in arrival order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dedup import BAND_ROWS, MINHASH_A, N_BANDS, _shingle_minhash_udf

VERDICT_SCHEMA = (
    "doc_id long, band int, band_sig string, dup_of long, est double,"
    " certain boolean"
)
STATE_SCHEMA = (
    "doc_ids array<long>, md5s array<string>, sigs array<array<long>>,"
    " last_ms bigint"
)


def near_dedup_stream(
    docs: DataFrame,
    threshold: float = 0.9,
    watermark: str = "10 minutes",
    ttl_minutes: int = 60,
) -> DataFrame:
    """Per-band duplicate verdicts for a document stream.

    ``docs``: streaming DataFrame with ``doc_id long, text string,
    ets timestamp`` (event time).  Returns one row per (doc, band) with
    ``dup_of`` set to the first earlier in-bucket match at estimate >=
    ``threshold`` (NULL if none) -- a doc is suppressed iff ANY of its
    bands matched, a stateless per-micro-batch reduction for the consumer
    (all of a doc's band rows ride the same trigger); see
    ``loser_ids_of_batch``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms = ttl_minutes * 60_000
    n_sig = len(MINHASH_A)

    udf = _shingle_minhash_udf()
    sigs = (
        docs.withWatermark("ets", watermark)
        .select(
            "doc_id",
            "ets",
            F.md5(F.col("text").cast("binary")).alias("md5_fp"),
            udf(F.col("text")).alias("s"),
        )
        .select("doc_id", "ets", "md5_fp", F.col("s.mh").alias("mh"))
        .filter(F.size("mh") > 0)
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "-",
                    *[
                        F.element_at(F.col("mh"), b * BAND_ROWS + r + 1).cast("string")
                        for r in range(BAND_ROWS)
                    ],
                ).alias("band_sig"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", "ets", "md5_fp", "mh", F.explode(band_structs).alias("b")
    ).select(
        "doc_id", "ets", "md5_fp", "mh",
        F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"),
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_ms + ttl: the bucket's content is stale
            state.remove()
            return
        if state.exists:
            doc_ids, md5s, sig_list, last_ms = state.get
            doc_ids, md5s = list(doc_ids), list(md5s)
            sig_list = [list(s) for s in sig_list]
        else:
            doc_ids, md5s, sig_list, last_ms = [], [], [], 0
        out: dict[str, list] = {
            "doc_id": [], "band": [], "band_sig": [],
            "dup_of": [], "est": [], "certain": [],
        }
        band, band_sig = int(key[0]), str(key[1])
        rows = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                rows.append(r)
        # arrival order within the trigger: event time, then doc id
        rows.sort(key=lambda r: (r.ets, r.doc_id))
        for r in rows:
            sig = [int(x) for x in r.mh]
            dup_of, est, certain = None, 0.0, False
            for i, seen_sig in enumerate(sig_list):
                e = sum(a == b for a, b in zip(sig, seen_sig)) / n_sig
                if e >= threshold:
                    dup_of = doc_ids[i]
                    est = e
                    certain = e == 1.0 and md5s[i] == r.md5_fp
                    break  # first earlier match wins
            # ALL seen docs enter state (batch pairs form among losers too)
            doc_ids.append(int(r.doc_id))
            md5s.append(str(r.md5_fp))
            sig_list.append(sig)
            last_ms = max(last_ms, int(pd.Timestamp(r.ets).value // 1_000_000))
            out["doc_id"].append(int(r.doc_id))
            out["band"].append(band)
            out["band_sig"].append(band_sig)
            out["dup_of"].append(dup_of)
            out["est"].append(est)
            out["certain"].append(certain)
        state.update((doc_ids, md5s, sig_list, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        yield pd.DataFrame(out)

    return bands.groupBy("band", "band_sig").applyInPandasWithState(
        update,
        outputStructType=VERDICT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def loser_ids_of_batch(verdict_rows) -> set[int]:
    """Reduce (doc, band) verdict rows to the per-doc loser set: a doc is a
    near-duplicate loser iff ANY band matched.  Stateless per micro-batch --
    every band row of a doc is emitted in the trigger that carried the doc."""
    return {int(r["doc_id"]) for r in verdict_rows if r["dup_of"] is not None}


DEDUP_GAUGE_SOURCE = "spark.streaming.nearDedup"


def verdict_quality_counts(verdict_batch: DataFrame):
    """Per-doc verdict-quality rollup of one micro-batch of (doc, band)
    verdict rows: ``certainDuplicates`` took the provably-exact path
    (full signature + md5 equality, jaccard exactly 1.0), ``uncertain
    Duplicates`` are estimate-only (the documented streaming-LSH tradeoff
    -- no shingle sets left to verify), ``uniqueDocs`` matched nothing.
    One distributed groupBy over the already-computed batch, then a
    3-number collect."""
    per_doc = verdict_batch.groupBy("doc_id").agg(
        F.max(F.col("dup_of").isNotNull()).alias("_dup"),
        F.max(F.when(F.col("dup_of").isNotNull(), F.col("certain"))).alias("_cert"),
    )
    row = per_doc.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("_dup") & F.col("_cert"), 1).otherwise(0)).alias("cert"),
        F.sum(F.when(F.col("_dup") & ~F.col("_cert"), 1).otherwise(0)).alias("unc"),
    ).first()
    docs = int(row["docs"] or 0)
    cert = int(row["cert"] or 0)
    unc = int(row["unc"] or 0)
    return {
        "certainDuplicates": cert,
        "uncertainDuplicates": unc,
        "uniqueDocs": docs - cert - unc,
    }


def dedup_verdict_monitor(analyzer=None, gauge_sinks=None, downstream=None):
    """``foreachBatch`` body surfacing per-batch verdict quality (r3 verdict
    ask #5): how much of the streaming dedup is exact-grade vs
    estimate-grade, visible at runtime instead of only in the docstring.

    Wire as ``near_dedup_stream(...).writeStream.outputMode("update")
    .foreachBatch(dedup_verdict_monitor(...)).start()``.  Each trigger
    publishes ``{certainDuplicates, uncertainDuplicates, uniqueDocs,
    batchId}`` under source ``spark.streaming.nearDedup``:

    - to ``analyzer`` (a ``LiveAnalyzer``) via ``set_extra_gauges`` -- the
      counts then ride the analyzer's registered gauge sinks on its next
      tick alongside the per-query A20 gauges;
    - to ``gauge_sinks`` directly (same contract as
      ``LiveAnalyzer.register_gauge_sink``: a callable ``(source, gauges)``
      or an object with ``.publish``), fail-open per sink;
    - the raw verdict batch to ``downstream(df, batch_id)`` if given, so
      monitoring does not displace the user's own sink.
    """

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        # two consumers (quality rollup + user sink): persist so the
        # stateful micro-batch is not recomputed per action
        batch_df.persist()
        try:
            gauges = verdict_quality_counts(batch_df)
            gauges["batchId"] = int(batch_id)
            if analyzer is not None:
                analyzer.set_extra_gauges(DEDUP_GAUGE_SOURCE, gauges)
            for sink in gauge_sinks or []:
                pub = getattr(sink, "publish", None) or sink
                try:
                    pub(DEDUP_GAUGE_SOURCE, dict(gauges))
                except Exception:
                    pass  # fail-open, like the analyzer's sink path
            if downstream is not None:
                downstream(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return _body
