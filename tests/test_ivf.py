"""IVF ANN local oracle: the full pipeline (quantized-exact centroids ->
map-only assignment -> nprobe probing -> exact re-rank) hash-checked against
DuckDB at two scale factors.  Not in the driver's 50-query surface (full);
this test runs the SAME comparator the driver uses."""

from __future__ import annotations

import pytest

from streaminglens_spark.functions.similarity import ivf_topk
from streaminglens_spark.oracle.compare import compare, duckdb_connect

IVF_SQL = """
WITH emb AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
normed AS (
    SELECT vec_id, label, v,
           sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                            (a, b) -> a + b)) AS nrm
    FROM emb
),
dims AS (
    SELECT label, CAST(t.i - 1 AS INT) AS dim,
           CAST(round(v[CAST(t.i AS INT)] * 1000000) AS BIGINT) AS q
    FROM emb CROSS JOIN (SELECT UNNEST(range(1, 65)) AS i) t
),
cent AS (
    SELECT label AS cell, dim,
           CAST(SUM(q) AS BIGINT) / 1000000.0 / COUNT(*) AS c
    FROM dims GROUP BY 1, 2
),
cnormed AS (
    SELECT cell, cv,
           sqrt(list_reduce(list_prepend(0.0, list_transform(cv, x -> x * x)),
                            (a, b) -> a + b)) AS cnrm
    FROM (SELECT cell, list(c ORDER BY dim) AS cv FROM cent GROUP BY cell)
),
cscored AS (
    SELECT vec_id, v, nrm, cell, cscore,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cscore DESC, cell) AS crn
    FROM (
        SELECT n.vec_id, n.v, n.nrm, c.cell,
               list_reduce(list_prepend(0.0,
                   list_transform(range(1, 65),
                       i -> n.v[CAST(i AS INT)] * c.cv[CAST(i AS INT)])),
                   (a, b) -> a + b) / (n.nrm * c.cnrm) AS cscore
        FROM normed n CROSS JOIN cnormed c
    )
),
assign AS (SELECT cell, vec_id, v, nrm FROM cscored WHERE crn = 1),
probes AS (
    SELECT cell, vec_id AS query_vec_id, v AS qv, nrm AS qn
    FROM cscored WHERE vec_id < 5 AND crn <= 2
),
cand AS (
    SELECT p.query_vec_id, a.vec_id AS neighbor_id,
           list_reduce(list_prepend(0.0,
               list_transform(range(1, 65),
                   i -> p.qv[CAST(i AS INT)] * a.v[CAST(i AS INT)])),
               (x, y) -> x + y) / (p.qn * a.nrm) AS cos_exact
    FROM probes p JOIN assign a USING (cell)
    WHERE a.vec_id != p.query_vec_id
)
SELECT query_vec_id, neighbor_id, round(cos_exact, 6) AS cosine
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_vec_id
                                 ORDER BY cos_exact DESC, neighbor_id) AS rn
    FROM cand
) WHERE rn <= 5
"""


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ivf_topk_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb_connect(sf_dir)
    try:
        r = compare(ivf_topk(emb), con, IVF_SQL)
        assert r["ok"], r
        assert r["spark_rows"] > 0
    finally:
        con.close()


def test_ivf_probing_subsets_exact(spark):
    """Every IVF hit is a true cosine value (re-rank is exact), and with
    nprobe = all cells IVF equals the exact scan restricted to k."""
    from streaminglens_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_cells = emb.select("label").distinct().count()
    full_probe = {
        (r["query_vec_id"], r["neighbor_id"], r["cosine"])
        for r in ivf_topk(emb, k=5, nprobe=n_cells).collect()
    }
    exact = {
        (r["query_vec_id"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk(emb, k=5).collect()
    }
    assert full_probe == exact
