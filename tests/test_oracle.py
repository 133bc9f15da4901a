"""Local twin of the driver's correctness gate: run every catalog
query in Spark AND its DuckDB oracle on the same parquet tables,
compare row count, column names, and (column-name-sorted,
row-sorted) values exactly."""

import math

import duckdb
import pandas as pd
import pytest

from spark_tsne_spark.plans.queries import catalog

SQL_QUERIES = [(n, q) for n, q in sorted(catalog().items()) if q.sql is not None]

# Oracles backed by a precomputed golden parquet are valid only at the
# scale the golden was generated for — the driver's correctness sf.
GOLDEN_SF_DIR = {
    "x2p_affinities": "/root/testdata/sf0.01",
    "knn_lsh_approx": "/root/testdata/sf0.01",
    "knn_lsh_banded_approx": "/root/testdata/sf0.01",
    "knn_lsh_banded_multiprobe": "/root/testdata/sf0.01",
    "ann_ivf_topk": "/root/testdata/sf0.01",
    "ann_ivf_index_query": "/root/testdata/sf0.01",
    "p3_pca_project": "/root/testdata/sf0.01",
    "tsne_embedding": "/root/testdata/sf0.01",
    "ann_ivf_pq_topk": "/root/testdata/sf0.01",
    "semdedup_prune": "/root/testdata/sf0.01",
    "bpe_vocab": "/root/testdata/sf0.01",
    "bpe_encode_stats": "/root/testdata/sf0.01",
    "bpe_token_histogram": "/root/testdata/sf0.01",
    "unigram_vocab": "/root/testdata/sf0.01",
    "unigram_encode_stats": "/root/testdata/sf0.01",
    "unigram_token_histogram": "/root/testdata/sf0.01",
    # oracle recomputes from the two encode goldens (sf0.01-pinned)
    "tokenizer_fertility": "/root/testdata/sf0.01",
    # oracle joins the sf0.01-pinned IVF golden against SQL-exact top-5
    "ann_recall_at_k": "/root/testdata/sf0.01",
    # oracle reads the batch files the entry writes at the sf0.01 path
    "schema_evolution_read": "/root/testdata/sf0.01",
    "embedding_procrustes_align": "/root/testdata/sf0.01",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the kind class the driver's
    value-hash is sensitive to: DuckDB HUGEINT reaching pandas as
    float64 (99111.0) hashes differently from Spark's int64 (99111)
    even though Python ``==`` accepts them (VERDICT r4 #1/#2)."""
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


@pytest.mark.parametrize("name,q", SQL_QUERIES, ids=[n for n, _ in SQL_QUERIES])
def test_query_matches_oracle(spark, sf_dir, duck, name, q):
    if name in GOLDEN_SF_DIR:
        sf_dir = GOLDEN_SF_DIR[name]
        duck = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    got = normalize(q.fn(spark, sf_dir).toPandas())
    want = normalize(duck.execute(q.sql).df())
    assert list(got.columns) == list(want.columns), (
        f"columns: spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"rows: spark={len(got)} duckdb={len(want)}"
    for col in got.columns:
        gk, wk = dtype_kind(got[col].dtype), dtype_kind(want[col].dtype)
        assert gk == wk, (
            f"{name}.{col}: dtype-kind drift spark={got[col].dtype}({gk}) "
            f"duckdb={want[col].dtype}({wk}) — the driver's hash is "
            f"dtype-sensitive; cast the oracle SQL (e.g. ::BIGINT)"
        )
        ga, wa = got[col].tolist(), want[col].tolist()
        mismatches = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not values_equal(x, y)
        ]
        assert not mismatches, f"{name}.{col}: first mismatches {mismatches[:5]}"
