"""Generate the golden parquet for the p3_pca_project catalog oracle.

INDEPENDENT twin of the Spark ML PCA path: sample covariance
(ddof=1) of the raw sf0.01 embeddings in plain numpy, `eigh`
eigendecomposition, top-8 components by eigenvalue, projection of the
UNcentered rows (Spark ML's PCA.transform convention), then
per-component sign canonicalization (flip so the max-|loading| row's
value is positive, ties to the lowest vec_id — the same rule the
catalog query applies; the reference loading can never be ~zero).
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
        # Canonicalize against the max-|loading| row (ties: lowest
        # vec_id — np.argmax picks the first occurrence and rows are
        # id-sorted). Unlike an arbitrary fixed row, this reference
        # can never be near zero, so the flip is always well-defined.
        r = int(np.argmax(np.abs(P[:, c])))
        assert abs(P[r, c]) > 1e-9, "component is identically ~zero"
        if P[r, c] < 0:
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
