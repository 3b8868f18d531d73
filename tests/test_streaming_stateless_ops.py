"""Streaming-readiness of the stateless corpus operators (r5): map-only
operators (quality classifier, chunking, hash sampling) must run
UNCHANGED on a streaming DataFrame -- zero stateful operators, per-batch
output bit-equal to the batch operator on the same rows.  This is the
cheap half of the streaming story: anything that is a pure projection /
generator works on a stream by construction, and these tests pin that
none of them accidentally grows a shuffle or state requirement."""

from __future__ import annotations

import json
import os

from streaminglens_spark.functions.sampling import hash_sample
from streaminglens_spark.functions.text import chunk_documents, quality_classifier
from tests.conftest import hidden_tmp, SF_DIR


def _doc_stream(spark, tmp_path, rows, files=2):
    src = str(tmp_path / "docs")
    os.makedirs(src)
    per = (len(rows) + files - 1) // files
    for i in range(files):
        path = os.path.join(src, f"f{i}.json")
        with open(hidden_tmp(path), "w") as f:
            for doc_id, text in rows[i * per : (i + 1) * per]:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.rename(hidden_tmp(path), path)
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )


def _run_stream(out, key_cols):
    got = set()

    def sink(df, batch_id):
        for r in df.collect():
            got.add(tuple(r))

    q = out.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    # stateless by construction: no state operators anywhere
    assert progress["stateOperators"] == [], progress["stateOperators"]
    return got


def test_quality_classifier_streams_bit_equal(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in quality_classifier(static_df).collect()}
    got = _run_stream(
        quality_classifier(_doc_stream(spark, tmp_path, rows)), ("doc_id",)
    )
    assert got == want


def test_chunk_documents_streams_bit_equal(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in chunk_documents(static_df).collect()}
    got = _run_stream(
        chunk_documents(_doc_stream(spark, tmp_path, rows)), ("doc_id", "chunk_idx")
    )
    assert got == want


def test_hash_sample_streams_bit_equal(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in hash_sample(static_df, "doc_id", 0.3).collect()}
    got = _run_stream(
        hash_sample(_doc_stream(spark, tmp_path, rows), "doc_id", 0.3), ("doc_id",)
    )
    assert got == want


def test_pq_encode_streams_bit_equal(spark, tmp_path):
    """PQ encoding against a batch-fit codebook is a stream-static
    broadcast join -- stateless, so a stream of vectors encodes bit-equal
    to the batch pass (the continuous-ingest form of corpus compression:
    fit offline, encode on arrival)."""
    import json as _json
    import os as _os

    from streaminglens_spark import cache
    from streaminglens_spark.functions.pq import pq_encode, pq_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = pq_fit(emb).persist()
    cb.count()
    try:
        want = {
            (r["vec_id"], r["sub"], r["code"]) for r in pq_encode(emb, cb).collect()
        }
        rows = [
            {"vec_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
            for r in emb.limit(80).collect()
        ]
        src = str(tmp_path / "vecs")
        _os.makedirs(src)
        for i in range(2):
            path = _os.path.join(src, f"f{i}.json")
            with open(hidden_tmp(path), "w") as f:
                for r in rows[i * 40 : (i + 1) * 40]:
                    f.write(_json.dumps(r) + "\n")
            _os.rename(hidden_tmp(path), path)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        got = set()

        def sink(df, batch_id):
            for r in df.collect():
                got.add((r["vec_id"], r["sub"], r["code"]))

        q = pq_encode(stream, cb).writeStream.foreachBatch(sink).start()
        try:
            q.processAllAvailable()
            assert q.lastProgress["stateOperators"] == []
        finally:
            q.stop()
        want80 = {t for t in want if t[0] in {r["vec_id"] for r in rows}}
        assert got == want80
    finally:
        cb.unpersist()
        cache.release_caches()


def test_dedup_increment_streams_per_batch(spark, tmp_path):
    """Incremental dedup in continuous form: each micro-batch of NEW docs
    scores against the static corpus index inside foreachBatch (the as-of
    enrichment recipe -- per-row answers need only the row + the index
    snapshot, so no streaming state).  Verdicts are bit-equal to running
    the batch operator over the same rows."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from streaminglens_spark import cache
    from streaminglens_spark.functions.dedup import (
        DUP_SHIFT,
        dedup_against_index,
        minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 40)
    index = minhash_index(corpus).persist()
    index.count()
    try:
        new_rows = [
            {"doc_id": r["doc_id"] + DUP_SHIFT, "text": r["text"]}
            for r in corpus.filter(F.col("doc_id") < 16).collect()
        ]
        src = str(tmp_path / "newdocs")
        _os.makedirs(src)
        for i in range(2):
            path = _os.path.join(src, f"f{i}.json")
            with open(hidden_tmp(path), "w") as f:
                for r in new_rows[i * 8 : (i + 1) * 8]:
                    f.write(_json.dumps(r) + "\n")
            _os.rename(hidden_tmp(path), path)

        want = {
            tuple(r)
            for r in dedup_against_index(
                spark.createDataFrame(new_rows, "doc_id long, text string"), index
            ).collect()
        }
        # NOTE: per-batch semantics intentionally differ from one-batch in
        # ONE way -- intra-new matches only see EARLIER rows of the same
        # micro-batch -- but this fixture's new docs are mutually distinct,
        # so the verdict sets are identical.
        got = set()

        def body(batch_df, batch_id):
            for r in dedup_against_index(batch_df, index).collect():
                got.add(tuple(r))

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        q = stream.writeStream.foreachBatch(body).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # >= 16: every new doc matches its original, plus whatever
        # cross-doc signature collisions clear the 0.5 estimate (the same
        # set in both modes -- equality is the real check)
        assert got == want and len(got) >= 16
    finally:
        index.unpersist()
        cache.release_caches()


def test_normalize_text_streams_bit_equal(spark, tmp_path):
    from streaminglens_spark.functions.text import dirty_corpus, normalize_text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in normalize_text(dirty_corpus(static_df)).collect()}
    got = _run_stream(
        normalize_text(dirty_corpus(_doc_stream(spark, tmp_path, rows))),
        ("doc_id",),
    )
    assert got == want


def test_canonicalize_urls_streams_bit_equal(spark, tmp_path):
    from streaminglens_spark.functions.urls import canonicalize_urls, url_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in canonicalize_urls(url_corpus(static_df)).collect()}
    got = _run_stream(
        canonicalize_urls(url_corpus(_doc_stream(spark, tmp_path, rows))),
        ("doc_id",),
    )
    assert got == want


def test_audio_frames_streams_bit_equal(spark, tmp_path):
    """The Arrow mapInPandas media ops are streaming-compatible by
    construction: frame features on a stream == batch, zero state."""
    from streaminglens_spark.functions.multimodal import (
        attach_wav_blob,
        audio_frames,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(40).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in audio_frames(attach_wav_blob(static_df)).collect()}
    got = _run_stream(
        audio_frames(attach_wav_blob(_doc_stream(spark, tmp_path, rows))),
        ("doc_id", "frame_idx"),
    )
    assert got == want


def test_probe_video_streams_bit_equal(spark, tmp_path):
    from streaminglens_spark.functions.multimodal import (
        attach_mp4_blob,
        probe_video,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(40).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in probe_video(attach_mp4_blob(static_df)).collect()}
    got = _run_stream(
        probe_video(attach_mp4_blob(_doc_stream(spark, tmp_path, rows))),
        ("doc_id",),
    )
    assert got == want


def test_winnow_fingerprints_streams_bit_equal(spark, tmp_path):
    """Winnowing extraction is a pure projection: streams unchanged,
    zero state, per-batch output bit-equal to batch (r5 continued)."""
    from streaminglens_spark.functions.winnow import winnow_fingerprints

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in winnow_fingerprints(static_df).collect()}
    got = _run_stream(
        winnow_fingerprints(_doc_stream(spark, tmp_path, rows)), ("doc_id",)
    )
    assert got == want


def test_ann_assign_fold_streams_bit_equal(spark, tmp_path):
    """Incremental IVF maintenance on a live stream: cell assignment as a
    fold over the broadcast centroid array (no window) runs UNCHANGED on
    a streaming DataFrame and is bit-equal -- cells AND scores -- to the
    batch ann_assign window form, including its tie-to-lower-cell rule."""
    import json as _json
    import os as _os

    from streaminglens_spark.functions.similarity import (
        ann_assign,
        ann_assign_fold,
        ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids(emb).persist()
    cents.count()
    try:
        want = {
            (r["vec_id"], r["cell"], r["cscore"])
            for r in ann_assign(emb, cents).collect()
        }
        fold_batch = {
            (r["vec_id"], r["cell"], r["cscore"])
            for r in ann_assign_fold(emb, cents).collect()
        }
        assert fold_batch == want  # window form == fold form, bit-exact

        rows = [
            {"vec_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
            for r in emb.limit(60).collect()
        ]
        src = str(tmp_path / "vecs")
        _os.makedirs(src)
        for i in range(2):
            path = _os.path.join(src, f"f{i}.json")
            with open(hidden_tmp(path), "w") as f:
                for r in rows[i * 30 : (i + 1) * 30]:
                    f.write(_json.dumps(r) + "\n")
            _os.rename(hidden_tmp(path), path)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        got = set()

        def sink(df, batch_id):
            for r in df.collect():
                got.add((r["vec_id"], r["cell"], r["cscore"]))

        q = ann_assign_fold(stream, cents).writeStream.foreachBatch(sink).start()
        try:
            q.processAllAvailable()
            assert q.lastProgress["stateOperators"] == []
        finally:
            q.stop()
        ids = {r["vec_id"] for r in rows}
        assert got == {t for t in want if t[0] in ids}
    finally:
        cents.unpersist()
