"""Join-reduction operators.

``bloom_semijoin`` is the runtime-filter pattern Spark's own DPP /
InSubquery runtime filters use on the JVM side, made explicit: build
a Bloom filter over the (already filtered) build-side keys, broadcast
the bits, drop probe rows that cannot possibly match BEFORE the
shuffle, then restore exactness with a normal semi join over the
survivors. At 100 TB the win is entirely in the probe scan → shuffle
edge: a 1 MiB bitmap broadcast replaces shuffling the full probe
table when the build side is selective, and false positives only
cost a few extra rows in the verify join — the RESULT is exact by
construction, the Bloom is a plan detail.

Sizing: with ``m`` bits, ``k`` hashes and ``n`` build keys the false
positive rate is (1 - e^{-kn/m})^k; the default m=2^20, k=4 holds
~1e-4 at n=10^4 and degrades gracefully — correctness never depends
on it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Two independent 64-bit multiplicative hashes; positions come from
# double hashing h1 + i*h2 (Kirsch–Mitzenmacher), all uint64 wraps.
_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) array of bit positions for int64 keys."""
    ks = keys.astype(np.uint64)
    h1 = ks * _H1
    h2 = (ks * _H2) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(bitmap, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def bloom_semijoin(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Exact semi join of ``probe`` against ``build`` keys, with a
    broadcast Bloom pre-filter on the probe side.

    Plan shape (the part that matters at 100 TB):

    1. build side → per-partition partial bitmaps (``mapInPandas``,
       one m/8-byte row per partition) → driver OR-merge. Driver
       state is O(m), independent of build cardinality.
    2. bitmap broadcast; probe scan drops non-members in a
       vectorized Arrow batch filter — these rows never reach the
       semi-join shuffle.
    3. ordinary semi join over the survivors removes Bloom false
       positives, so the output is exactly ``probe ⋉ build``.
    """
    from spark_tsne_spark.shipping import ship_package

    spark = probe.sparkSession
    ship_package(spark)
    nbytes = m_bits // 8

    def partial_bloom(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            _set_bits(bitmap, _positions(pdf["k"].to_numpy(np.int64), m_bits, k))
        if seen:
            yield pd.DataFrame({"bits": [bitmap.tobytes()]})

    # NULL build keys can never match a semi join — and Arrow hands a
    # nullable long column to pandas as float64 with NaN, which would
    # crash .to_numpy(np.int64) (and lose exactness above 2^53), so
    # drop them in the build projection itself.
    build_keys = build.select(
        F.col(build_key).cast("long").alias("k")
    ).where(F.col("k").isNotNull())
    partials = build_keys.mapInPandas(
        partial_bloom, T.StructType([T.StructField("bits", T.BinaryType())])
    ).collect()
    bitmap = np.zeros(nbytes, dtype=np.uint8)
    for row in partials:
        bitmap |= np.frombuffer(row["bits"], dtype=np.uint8)
    b_bits = spark.sparkContext.broadcast(bitmap.tobytes())

    probe_cols = probe.columns

    def bloom_filter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.frombuffer(b_bits.value, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL probe keys can never match a semi join — drop them
            # here rather than let the hash path see NaN.
            keys = pdf[probe_key]
            valid = keys.notna().to_numpy()
            pos = _positions(
                keys[valid].to_numpy(np.int64), m_bits, k
            )
            member = np.ones(int(valid.sum()), dtype=bool)
            for i in range(k):
                p = pos[:, i]
                member &= (bm[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
            keep = np.zeros(len(pdf), dtype=bool)
            keep[np.flatnonzero(valid)[member]] = True
            out = pdf[keep]
            if len(out):
                yield out

    pre = probe.mapInPandas(bloom_filter, probe.select(*probe_cols).schema)
    return pre.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        on=probe_key,
        how="left_semi",
    )
