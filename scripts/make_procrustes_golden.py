"""Generate the golden parquet for the embedding_procrustes_align
catalog oracle.

INDEPENDENT numpy twin of the distributed Procrustes pipeline: read
the sf0.01 embeddings, build the same deterministic "new model
version" Y = X @ R0 (R0 = QR-orthogonalized seeded Gaussian, the
exact construction the catalog entry uses), compute M = X^T Y in ONE
numpy product (different accumulation order than the distributed
per-partition sums — agreement is ~1e-12 before the shared 6-decimal
rounding), SVD, R = U V^T, and write the (i, j, r) long-form matrix.

    python scripts/make_procrustes_golden.py
"""

from __future__ import annotations

import os

import duckdb
import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "procrustes_sf001.parquet",
)


def reference_rotation(d: int) -> np.ndarray:
    """The deterministic 'model v2' rotation shared with the entry."""
    rng = np.random.default_rng(20240815)
    A = rng.standard_normal((d, d))
    Q, Rq = np.linalg.qr(A)
    # canonicalize QR's sign ambiguity so Q is unique
    Q = Q * np.sign(np.diag(Rq))
    return Q


def main() -> None:
    con = duckdb.connect()
    tbl = con.sql(
        "SELECT vec_id, embedding FROM "
        "'/root/testdata/sf0.01/embeddings.parquet' ORDER BY vec_id"
    ).fetchnumpy()
    X = np.array(tbl["embedding"].tolist(), dtype=np.float64)
    d = X.shape[1]
    R0 = reference_rotation(d)
    Y = X @ R0
    M = X.T @ Y
    U, S, Vt = np.linalg.svd(M)
    R = U @ Vt
    # the recovered rotation must BE the planted one
    assert np.max(np.abs(R - R0)) < 1e-9, np.max(np.abs(R - R0))
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    import pandas as pd

    pd.DataFrame(
        {
            "i": ii.reshape(-1).astype(np.int64),
            "j": jj.reshape(-1).astype(np.int64),
            "r": np.round(R.reshape(-1), 6),
        }
    ).to_parquet(OUT, index=False)
    print(f"wrote {OUT}: d={d}, max|R-R0|={np.max(np.abs(R - R0)):.2e}")


if __name__ == "__main__":
    main()
