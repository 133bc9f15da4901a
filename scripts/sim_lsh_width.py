"""Local numpy simulator of the banded-LSH width tune + recall at the
duplicate-dense scale shapes (VERDICT r12 #1 design harness).

Replicates knn_lsh_banded_lists' geometry exactly — same projection
matrix (default_rng(42).normal((d, L*B))), same floored band cells,
same multi-probe flip rule, same occupancy halving rule, same
shard-salting — over the SAME synthetic corpus construction as
scripts/scale_lsh_flagship.py (N jittered copies of the sf0.1
embeddings; jitter drawn uniform{0..999}/1e4 per coordinate, which is
the statistical shape of the script's xxhash64 jitter without the JVM
hash). Recall is computed as candidate coverage: j counts as found for
query i iff j is a role-0 member of some (t, bucket, shard) group
that i occupies — per-bucket/shard local top-k provably loses no true
top-k pair beyond that (see the operator docstring).

Purpose: iterate on the width-tune rule (recall floor) in seconds
instead of 25-minute Spark runs; the shipped rule is then validated
with a real scale run.

    python scripts/sim_lsh_width.py <copies> [--queries Q]
"""

import sys
import time

import numpy as np
import pyarrow.parquet as pq

L, B, NP = 6, 4, 2  # the shipped affinity dials (6 tables x 2 probes)
K = 90
MAX_BUCKET = 4096
OCC_TARGET = 1 / 3
SEED = 42


def build_corpus(copies_n):
    tbl = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    base = np.asarray(tbl.column("embedding").combine_chunks().flatten()).reshape(
        tbl.num_rows, -1
    ).astype(np.float64)
    nb, d = base.shape
    rng = np.random.default_rng(123)
    X = np.repeat(base, copies_n, axis=0)
    X += rng.integers(0, 1000, size=X.shape).astype(np.float64) / 1e4
    cloud = np.repeat(np.arange(nb), copies_n)  # cloud id per row
    # ids: vec_id + copy*1e6 (sorted-by-id sample = copy 0 of low vec_ids)
    ids = np.tile(np.arange(copies_n, dtype=np.int64) * 1_000_000, nb) + np.repeat(
        np.arange(nb, dtype=np.int64), copies_n
    )
    return X, ids, cloud, nb, d


def derive_width(X, ids):
    order = np.argsort(ids, kind="stable")[:1024]
    S = X[order]
    rng = np.random.default_rng(SEED)
    m = len(S)
    ii = rng.integers(0, m, size=2048)
    jj = rng.integers(0, m, size=2048)
    keep = ii != jj
    diffs = S[ii[keep]] - S[jj[keep]]
    d = np.sqrt((diffs * diffs).sum(axis=1))
    d = d[d > 0]
    return float(np.quantile(d, 0.15))


def assignments_for_table(Pt, w):
    """Pt: (n, B) projections of one table. Returns (base_cells,
    probe_cells) each (n, B) int64 — the probe is the single
    r=0 flip (NP=2)."""
    q = Pt / w
    cells = np.floor(q).astype(np.int64)
    fr = q - cells
    dist = np.minimum(fr, 1.0 - fr)  # (n, B)
    c = np.argmin(dist, axis=1)  # flip coord (argmin == array_sort first)
    s = np.where(fr[np.arange(len(fr)), c] < 0.5, -1, 1)
    probe = cells.copy()
    probe[np.arange(len(probe)), c] += s
    return cells, probe


def bucket_keys(cells, t):
    # composite int64 key (stat-equivalent to xxhash64(t, *cells))
    h = np.full(len(cells), np.int64(t + 1))
    for b in range(cells.shape[1]):
        h = h * np.int64(1000003) + cells[:, b]
        h ^= h >> 23
        h *= np.int64(0x2545F4914F6CDD1D)
    return h


def occupancy_stats(P, w):
    """over-cap assignment count + bucket-size histogram summary over
    all tables incl probes (q role irrelevant for occupancy)."""
    n = P.shape[0]
    over = 0
    total = 0
    max_sizes = []
    for t in range(L):
        Pt = P[:, t * B : (t + 1) * B]
        cells, probe = assignments_for_table(Pt, w)
        keys = np.concatenate([bucket_keys(cells, t), bucket_keys(probe, t)])
        _, inv, cnt = np.unique(keys, return_inverse=True, return_counts=True)
        over += int(cnt[cnt > MAX_BUCKET].sum())
        total += len(keys)
        max_sizes.append(int(cnt.max()))
    return over, total, max_sizes


def recall_at(P, X, ids, w, q_idx, true_nb):
    """Candidate-coverage recall@K for query rows q_idx given true
    neighbor index lists true_nb (positions)."""
    n = P.shape[0]
    found = np.zeros((len(q_idx), K), dtype=bool)
    rng = np.random.default_rng(777)
    for t in range(L):
        Pt = P[:, t * B : (t + 1) * B]
        cells, probe = assignments_for_table(Pt, w)
        kb = bucket_keys(cells, t)
        kp = bucket_keys(probe, t)
        # bucket sizes from MEMBER(base)+probe rows (occupancy includes both)
        keys_all = np.concatenate([kb, kp])
        uk, cnt = np.unique(keys_all, return_counts=True)
        nsh_of = np.ones(len(uk), dtype=np.int64)
        big = cnt > MAX_BUCKET
        nsh_of[big] = -(-cnt[big] // MAX_BUCKET)
        # shard of each row in its base bucket (members) — use a
        # per-(row,t) deterministic pseudo-hash
        shard_salt = rng.integers(0, 2**62, size=n)
        pos_b = np.searchsorted(uk, kb)
        nsh_b = nsh_of[pos_b]
        shard_b = (shard_salt + kb) % nsh_b  # member shard
        pos_p = np.searchsorted(uk, kp)
        nsh_p = nsh_of[pos_p]
        shard_p = (shard_salt + kp) % nsh_p  # probe-row shard
        # for each query, its occupied groups: (kb, shard_b) and (kp, shard_p)
        # j found iff kb[j]==occupied key and shard_b[j]==occupied shard
        # (j as MEMBER only: base assignment)
        for qi, q in enumerate(q_idx):
            nbrs = true_nb[qi]
            hit = (kb[nbrs] == kb[q]) & (shard_b[nbrs] == shard_b[q])
            hit |= (kb[nbrs] == kp[q]) & (shard_b[nbrs] == shard_p[q])
            # symmetric probing: j's probe assignment is also indexed
            # (probe_index=True → probes are role 0: indexed AND querying)
            hit |= (kp[nbrs] == kb[q]) & (shard_p[nbrs] == shard_b[q])
            hit |= (kp[nbrs] == kp[q]) & (shard_p[nbrs] == shard_p[q])
            found[qi] |= hit
    return float(found.mean())


def exact_topk(X, q_idx):
    sq = (X * X).sum(axis=1)
    out = []
    for q in q_idx:
        d = sq - 2.0 * (X @ X[q])
        d[q] = np.inf
        idx = np.argpartition(d, K - 1)[:K]
        out.append(idx[np.argsort(d[idx], kind="stable")])
    return out


def kth_dist_sample(X, q_idx, k):
    sq = (X * X).sum(axis=1)
    ds = []
    for q in q_idx:
        d = sq + (X[q] * X[q]).sum() - 2.0 * (X @ X[q])
        d[q] = np.inf
        ds.append(np.sqrt(max(0.0, np.partition(d, k - 1)[k - 1])))
    return np.asarray(ds)


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 1580
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    t0 = time.time()
    X, ids, cloud, nb, d = build_corpus(copies)
    n = len(X)
    print(f"corpus n={n} ({nb} bases x {copies}) built {time.time()-t0:.1f}s")
    R = np.random.default_rng(SEED).normal(size=(d, L * B))
    P = X @ R
    print(f"projected {time.time()-t0:.1f}s")
    q15 = derive_width(X, ids)
    w0 = q15 * 2.0
    print(f"derive quantile(0.15)={q15:.4f}  w0={w0:.4f}")
    # exact d_k for a spread query sample (the floor's input)
    rngq = np.random.default_rng(99)
    q_idx = rngq.choice(n, size=nq, replace=False)
    dk = kth_dist_sample(X, q_idx[:128], K)
    print(
        f"d_{K} sample: median={np.median(dk):.4f} q90={np.quantile(dk,0.9):.4f} "
        f"max={dk.max():.4f}  ({time.time()-t0:.1f}s)"
    )
    true_nb = exact_topk(X, q_idx)
    print(f"exact GT for {nq} queries {time.time()-t0:.1f}s")
    # width sweep: the tune's halving sequence
    w = w0
    stop_w = None
    for h in range(13):
        over, total, mx = occupancy_stats(P, w)
        rec = recall_at(P, X, ids, w, q_idx, true_nb)
        flag = ""
        if stop_w is None and over <= OCC_TARGET * total:
            stop_w = w
            flag = "  <= TUNE STOPS HERE"
        print(
            f"h={h} w={w:.4f} over={over}/{total} ({over/total:.3f}) "
            f"maxbucket={max(mx)} recall@{K}={rec:.4f}{flag}",
            flush=True,
        )
        if stop_w is not None and over == 0 and rec < 0.2:
            break
        w /= 2.0
    print(f"done {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
