"""Generate the golden parquet for the p3_pca_project catalog oracle.

INDEPENDENT twin of the Spark ML PCA path: sample covariance
(ddof=1) of the raw sf0.01 embeddings in plain numpy, `eigh`
eigendecomposition, top-8 components by eigenvalue, projection of the
UNcentered rows (Spark ML's PCA.transform convention), then
per-component sign canonicalization (flip so the minimum-vec_id row's
loading is positive — the same rule the catalog query applies).
Agreement with the distributed pipeline is ~1e-14 before the shared
6-decimal rounding.

    python scripts/make_pca_golden.py
"""

from __future__ import annotations

import os

import duckdb
import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "pca_project_sf001.parquet",
)
K = 8


def main() -> None:
    con = duckdb.connect()
    tbl = con.sql(
        "SELECT vec_id, embedding FROM '/root/testdata/sf0.01/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchnumpy()
    ids = tbl["vec_id"].astype(np.int64)
    X = np.array(tbl["embedding"].tolist(), dtype=np.float64)
    C = np.cov(X.T, ddof=1)
    w, V = np.linalg.eigh(C)
    comp = V[:, np.argsort(-w)[:K]]
    P = X @ comp
    for c in range(K):
        ref = P[0, c]
        assert ref != 0.0, "sign-canonicalization reference loading is zero"
        if ref < 0:
            P[:, c] *= -1

    rows = [
        (int(i), int(c), round(float(P[r, c]), 6))
        for r, i in enumerate(ids)
        for c in range(K)
    ]
    con.execute("CREATE TABLE g (vec_id BIGINT, c INTEGER, v DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
    con.execute(
        f"COPY (SELECT * FROM g ORDER BY vec_id, c) TO '{OUT}' (FORMAT PARQUET)"
    )
    print(f"wrote {len(rows)} rows to {OUT}")


if __name__ == "__main__":
    main()
