"""Evaluate specific (width, max_bucket) points of the banded-LSH
geometry at a given copy count — companion to sim_lsh_width.py for
picking the recall-floor rule.

    python scripts/sim_lsh_eval.py <copies> <nq> w:cap [w:cap ...]
"""

import sys
import time

import numpy as np

import sim_lsh_width as S


def recall_at_cap(P, ids, w, q_idx, true_nb, cap):
    n = P.shape[0]
    found = np.zeros((len(q_idx), S.K), dtype=bool)
    rng = np.random.default_rng(777)
    over = 0
    total = 0
    for t in range(S.L):
        Pt = P[:, t * S.B : (t + 1) * S.B]
        cells, probe = S.assignments_for_table(Pt, w)
        kb = S.bucket_keys(cells, t)
        kp = S.bucket_keys(probe, t)
        keys_all = np.concatenate([kb, kp])
        uk, cnt = np.unique(keys_all, return_counts=True)
        over += int(cnt[cnt > cap].sum())
        total += len(keys_all)
        nsh_of = np.ones(len(uk), dtype=np.int64)
        big = cnt > cap
        nsh_of[big] = -(-cnt[big] // cap)
        shard_salt = rng.integers(0, 2**62, size=n)
        shard_b = (shard_salt + kb) % nsh_of[np.searchsorted(uk, kb)]
        shard_p = (shard_salt + kp) % nsh_of[np.searchsorted(uk, kp)]
        for qi, q in enumerate(q_idx):
            nbrs = true_nb[qi]
            hit = (kb[nbrs] == kb[q]) & (shard_b[nbrs] == shard_b[q])
            hit |= (kb[nbrs] == kp[q]) & (shard_b[nbrs] == shard_p[q])
            hit |= (kp[nbrs] == kb[q]) & (shard_p[nbrs] == shard_b[q])
            hit |= (kp[nbrs] == kp[q]) & (shard_p[nbrs] == shard_p[q])
            found[qi] |= hit
    return float(found.mean()), over / total


def main():
    copies = int(sys.argv[1])
    nq = int(sys.argv[2])
    pts = [tuple(map(float, a.split(":"))) for a in sys.argv[3:]]
    t0 = time.time()
    X, ids, cloud, nb, d = S.build_corpus(copies)
    R = np.random.default_rng(S.SEED).normal(size=(d, S.L * S.B))
    P = X @ R
    rngq = np.random.default_rng(99)
    q_idx = rngq.choice(len(X), size=nq, replace=False)
    true_nb = S.exact_topk(X, q_idx)
    print(f"setup {time.time()-t0:.1f}s n={len(X)}")
    for w, cap in pts:
        rec, ov = recall_at_cap(P, ids, w, q_idx, true_nb, int(cap))
        print(
            f"w={w:.4f} cap={int(cap)} recall@{S.K}={rec:.4f} over={ov:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
