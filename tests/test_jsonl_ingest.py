"""Schema-drift-tolerant JSONL ingest: missing fields -> NULL, type
mismatches and broken JSON -> quarantine (never silently dropped, never
job-fatal), clean rows parsed exactly."""

from __future__ import annotations

import os

from streaminglens_spark.sources.loaders import read_jsonl_docs


def _write(tmp_path, lines):
    src = str(tmp_path / "feed")
    os.makedirs(src)
    with open(os.path.join(src, "part0.jsonl"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return src


def test_good_bad_split(spark, tmp_path):
    lines = [
        '{"doc_id": 1, "text": "hello", "lang": "en", "source": "s1"}',
        '{"doc_id": 2, "text": "drift"}',                      # missing cols
        '{"doc_id": "NaN", "text": "bad type"}',               # type mismatch
        '{broken json',                                        # unparseable
        '{"doc_id": 5, "text": null, "lang": "de", "source": "s2"}',
    ]
    good, bad = read_jsonl_docs(spark, _write(tmp_path, lines))
    g = {r["doc_id"]: r for r in good.collect()}
    assert set(g) == {1, 2, 5}
    assert g[1]["text"] == "hello" and g[1]["source"] == "s1"
    assert g[2]["lang"] is None and g[2]["source"] is None  # drift -> NULL
    assert g[5]["text"] is None
    raw = sorted(r["_corrupt_record"] for r in bad.collect())
    assert len(raw) == 2
    assert any("broken json" in r for r in raw)
    assert any('"NaN"' in r for r in raw)  # whole row preserved for triage


def test_all_good_has_empty_quarantine(spark, tmp_path):
    lines = ['{"doc_id": %d, "text": "t%d", "lang": "en", "source": "s"}' % (i, i)
             for i in range(20)]
    good, bad = read_jsonl_docs(spark, _write(tmp_path, lines))
    assert good.count() == 20
    assert bad.count() == 0


def test_counts_partition_the_input(spark, tmp_path):
    """good + bad == input lines: nothing silently dropped (the failure
    mode this wrapper exists to prevent)."""
    lines = (
        ['{"doc_id": %d, "text": "x"}' % i for i in range(7)]
        + ["not json at all"] * 3
        + ['{"doc_id": true}']
    )
    good, bad = read_jsonl_docs(spark, _write(tmp_path, lines))
    assert good.count() + bad.count() == len(lines)
