"""A/B the FlatTree builders: level-sort (r11) vs Morton (r12).

VERDICT r11 #1: the driver-side tree build is the one scale-killer
left at >=10^7 rows (44.3 s/iteration coarse at 10M, level-pass-bound
not node-bound). This script interleaves the two builders ABBA-style
(host weather swings up to 2.8x between adjacent runs — SCALE.md r11
discipline) over the same Gaussian-mixture embedding shape
scale_tree_10m.py uses, at n in {1M, 3.16M, 10M} x leaf_size {1, 32},
and verifies structure equality (bit-exact everything except the
~ulp-level center floats) at each point.

    python scripts/ab_tree_build.py [reps]
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


def check_equal(a: FlatTree, b: FlatTree) -> float:
    assert a.n_nodes == b.n_nodes
    assert (a.count == b.count).all()
    assert (a.children == b.children).all()
    assert (a.leaf == b.leaf).all()
    assert (a.radius_sq == b.radius_sq).all()
    assert (a.leaf_start == b.leaf_start).all()
    if len(a.leaf_pts) or len(b.leaf_pts):
        # same member multiset per leaf; morton packs rows in morton
        # order, level in original-index order (sample-checked here,
        # exhaustively pinned in tests/test_r12_fixes.py)
        assert a.leaf_pts.shape == b.leaf_pts.shape
        slots = np.flatnonzero(a.leaf_start >= 0)
        for slot in slots[:: max(1, len(slots) // 200)]:
            s, c = a.leaf_start[slot], a.count[slot]
            ra = np.asarray(a.leaf_pts)[s:s + c]
            rb = np.asarray(b.leaf_pts)[
                b.leaf_start[slot]:b.leaf_start[slot] + c
            ]
            assert (ra[np.lexsort(ra.T)] == rb[np.lexsort(rb.T)]).all()
    scale = np.abs(a.center).max() or 1.0
    return float(np.abs(a.center - b.center).max() / scale)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {}
    for n in (1_000_000, 3_162_000, 10_000_000):
        Y = mixture(n)
        for leaf_size in (1, 32):
            t_lv, t_mo = [], []
            trees = {}
            for r in range(reps):
                # ABBA: alternate which arm goes first per rep
                arms = (
                    [("level", t_lv), ("morton", t_mo)]
                    if r % 2 == 0
                    else [("morton", t_mo), ("level", t_lv)]
                )
                for method, acc in arms:
                    t0 = time.time()
                    tree = FlatTree.build(
                        Y, leaf_size=leaf_size, method=method
                    )
                    acc.append(round(time.time() - t0, 3))
                    trees[method] = tree
            cdiff = check_equal(trees["level"], trees["morton"])
            key = f"n{n}_leaf{leaf_size}"
            out[key] = {
                "level": t_lv, "morton": t_mo,
                "level_min": min(t_lv), "morton_min": min(t_mo),
                "speedup": round(min(t_lv) / min(t_mo), 2),
                "center_rel_maxdiff": cdiff,
                "n_nodes": trees["level"].n_nodes,
            }
            print(
                f"{key}: level={t_lv} morton={t_mo} "
                f"speedup={out[key]['speedup']}x "
                f"center_rel_maxdiff={cdiff:.2e}",
                flush=True,
            )
            del trees
    print(json.dumps(out))


if __name__ == "__main__":
    main()
