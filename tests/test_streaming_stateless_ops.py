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
from tests.conftest import SF_DIR


def _doc_stream(spark, tmp_path, rows, files=2):
    src = str(tmp_path / "docs")
    os.makedirs(src)
    per = (len(rows) + files - 1) // files
    for i in range(files):
        path = os.path.join(src, f"f{i}.json")
        with open(path + ".tmp", "w") as f:
            for doc_id, text in rows[i * per : (i + 1) * per]:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.rename(path + ".tmp", path)
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
            with open(path + ".tmp", "w") as f:
                for r in rows[i * 40 : (i + 1) * 40]:
                    f.write(_json.dumps(r) + "\n")
            _os.rename(path + ".tmp", path)
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
