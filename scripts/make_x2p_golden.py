"""Generate the golden affinities parquet for the x2p_affinities
catalog oracle (VERDICT round-1 item 8).

Computes conditional P with an INDEPENDENT driver-side dense path —
full n×n distance matrix (no chunking, no Spark, no knn_exact_block)
+ the shared per-row β bisection (`_calibrate_row`, the numerical
contract both paths implement) — at the catalog entry's exact
parameters (sf0.01 embeddings, perplexity=10). Values are rounded to
6 decimals exactly as the Spark query rounds, so the DuckDB oracle
`read_parquet` comparison is a strict value check of the distributed
kNN + calibration pipeline against an independently-derived result.

Regenerate (only if the driver's testdata generator ever changes —
it is seeded and has hashed identically across rounds):

    python scripts/make_x2p_golden.py
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "x2p_affinities_sf001.parquet",
)
PERPLEXITY = 10.0
TOL = 1e-5


def main() -> None:
    from spark_tsne_spark.operators.x2p import _calibrate_row

    con = duckdb.connect()
    tbl = con.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchnumpy()
    ids = tbl["vec_id"].astype(np.int64)
    X = np.array(tbl["embedding"].tolist(), dtype=np.float64)
    n = len(ids)
    mu = min(int(3 * PERPLEXITY), n - 1)
    log_u = math.log(PERPLEXITY)

    sq = (X * X).sum(axis=1)
    d = sq[:, None] + sq[None, :] - 2.0 * (X @ X.T)
    np.maximum(d, 0.0, out=d)
    np.fill_diagonal(d, np.inf)
    idx = np.argpartition(d, mu - 1, axis=1)[:, :mu]

    out_i = np.repeat(ids, mu)
    out_j = np.empty(n * mu, dtype=np.int64)
    out_p = np.empty(n * mu, dtype=np.float64)
    for r in range(n):
        _beta, p = _calibrate_row(d[r, idx[r]], log_u, TOL)
        out_j[r * mu : (r + 1) * mu] = ids[idx[r]]
        out_p[r * mu : (r + 1) * mu] = p

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    con.execute("CREATE TABLE g (i BIGINT, j BIGINT, p DOUBLE)")
    con.executemany(
        "INSERT INTO g VALUES (?, ?, ?)",
        [
            (int(i), int(j), round(float(p), 6))
            for i, j, p in zip(out_i, out_j, out_p)
        ],
    )
    con.execute(f"COPY (SELECT * FROM g ORDER BY i, j) TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {n * mu} rows to {OUT}")


if __name__ == "__main__":
    main()
