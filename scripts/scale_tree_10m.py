"""Measure the per-iteration driver tree build at 10⁷ points
(VERDICT r10 #4: the growing serial term — 0.1 s at 50k, 4.1 s at
1M; is 10M viable?).

Builds FlatTree over n 2-D points drawn from a Gaussian mixture (the
shape a mid-optimization t-SNE embedding actually has: cluster blobs
+ spread), times the build at n ∈ {1M, 3.16M, 10M}, and reports the
scale exponent. Pure driver work — no Spark session.

    python scripts/scale_tree_10m.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spark_tsne_spark.sptree import FlatTree


def mixture(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    k = 30
    centers = rng.normal(scale=30.0, size=(k, 2))
    which = rng.integers(0, k, size=n)
    return centers[which] + rng.normal(scale=1.5, size=(n, 2))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    leaf_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    out = {"leaf_size": leaf_size}
    for n in (1_000_000, 3_162_000, 10_000_000):
        Y = mixture(n)
        ts = []
        nodes = None
        nbytes = None
        for _ in range(reps):
            t0 = time.time()
            tree = FlatTree.build(Y, leaf_size=leaf_size)
            ts.append(round(time.time() - t0, 3))
            nodes = tree.n_nodes
            nbytes = (
                tree.center.nbytes + tree.count.nbytes
                + tree.radius_sq.nbytes + tree.leaf.nbytes
                + tree.children.nbytes + tree.leaf_start.nbytes
                + tree.leaf_pts.nbytes
            )
        out[str(n)] = {
            "build_sec": ts, "min": min(ts), "n_nodes": nodes,
            "mb": round(nbytes / 2**20, 1),
        }
        print(
            f"n={n}: min={min(ts)}s runs={ts} nodes={nodes} "
            f"size={out[str(n)]['mb']}MB",
            flush=True,
        )
    import math

    e = math.log(out["10000000"]["min"] / out["1000000"]["min"]) / math.log(10)
    out["exponent_1m_to_10m"] = round(e, 3)
    print("TREE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
