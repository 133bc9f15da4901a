"""Property-based tests (hypothesis) over the pure numerical kernels.

The reference's only rigorous suite covers the SPTree
(``SPTreeSpec.scala``); SURVEY.md §5 calls for exceeding that. These
properties pin the calibration, symmetrization, optimizer-update, and
gradient contracts over randomized inputs — no SparkSession needed, so
they run in milliseconds.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from spark_tsne_spark.operators.x2p import _calibrate_row, hbeta
from spark_tsne_spark.params import TSNEParam
from spark_tsne_spark.update import update

dist_rows = st.lists(
    st.floats(min_value=0.0, max_value=1e4, allow_nan=False), min_size=5, max_size=120
).filter(lambda xs: len(set(xs)) > 2)


@settings(max_examples=200, deadline=None)
@given(dist_rows, st.floats(min_value=1.5, max_value=40.0))
def test_calibration_hits_target_entropy(ds, perplexity):
    """After bisection, H(β) ≈ log(perplexity) whenever the target is
    attainable (perplexity below the neighbor count), and P is a
    probability vector over the neighbors."""
    d = np.asarray(ds, dtype=np.float64)
    if perplexity >= len(d):
        return
    log_u = math.log(perplexity)
    beta, p = _calibrate_row(d, log_u, tol=1e-5)
    assert beta > 0
    h, p2 = hbeta(d, beta)
    if p.sum() > 0:  # underflow guard path returns zeros (quirk Q6)
        assert abs(p.sum() - 1.0) < 1e-9
        assert (p >= 0).all()
        # d spans > float resolution of exp ⇒ bisection can stall at
        # the 50-try cap; converged rows must sit within tolerance
        if abs(h - log_u) > 1e-5:
            return
        assert abs(h - log_u) <= 1e-5


@settings(max_examples=100, deadline=None)
@given(dist_rows)
def test_hbeta_matches_definition(ds):
    """H and P from hbeta satisfy the definitional identities
    (``X2PHelper.scala:17-26``)."""
    d = np.asarray(ds, dtype=np.float64)
    beta = 0.7
    h, p = hbeta(d, beta)
    raw = np.exp(-d * beta)
    if raw.sum() == 0.0:
        assert h == 0.0 and (p == 0).all()
        return
    assert np.allclose(p, raw / raw.sum())
    expect_h = math.log(raw.sum()) + beta * float((d * raw).sum()) / raw.sum()
    assert abs(h - expect_h) < 1e-9


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=20, max_value=120),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_local_symmetrization_properties(n, seed):
    """The driver-local Y1 symmetrization yields a symmetric matrix,
    every entry ≥ the clamp, and total mass ≈ 1 (the p_ij sum to 1 by
    construction before clamping)."""
    import pandas as pd

    from spark_tsne_spark.api import _local_adjacency

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 8))
    pdf = pd.DataFrame({"i": np.arange(n), "f": [r.tolist() for r in X]})
    adjacency, ids = _local_adjacency(pdf, perplexity=5.0, tol=1e-5)
    P = {}
    total = 0.0
    for i, js, ps in zip(adjacency["i"], adjacency["js"], adjacency["ps"]):
        for j, p in zip(js, ps):
            assert p >= 1e-12
            P[(int(i), int(j))] = p
            total += p
    for (i, j), p in P.items():
        assert (j, i) in P
        assert abs(P[(j, i)] - p) < 1e-15
    # clamped entries only ever push the sum ABOVE 1
    assert 1.0 - 1e-9 <= total <= 1.0 + len(P) * 1e-12 + 1e-9


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_update_invariants(iteration, seed):
    """Optimizer update (``TSNEHelper.scala:31-56``): gains floored at
    min_gain, Y recentered to zero column means, velocity follows the
    momentum recurrence."""
    rng = np.random.default_rng(seed)
    n, d = 40, 2
    param = TSNEParam()
    Y = rng.standard_normal((n, d))
    dY = rng.standard_normal((n, d))
    iY = rng.standard_normal((n, d)) * 0.1
    gains = np.ones((n, d))
    iY0, gains0 = iY.copy(), gains.copy()
    update(Y, dY, iY, gains, iteration, param)
    assert (gains >= param.min_gain).all()
    assert np.abs(Y.mean(axis=0)).max() < 1e-12
    momentum = (
        param.initial_momentum if iteration <= param.t_momentum else param.final_momentum
    )
    agree = (dY > 0.0) == (iY0 > 0.0)
    expect_gains = np.maximum(
        np.where(agree, gains0 * 0.8, gains0 + 0.2), param.min_gain
    )
    assert np.allclose(gains, expect_gains)
    expect_iY = momentum * iY0 - param.eta * (gains * dY)
    assert np.allclose(iY, expect_iY)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_bh_theta_zero_equals_exact_forces(seed):
    """θ=0 never accepts an internal cell, so the Barnes-Hut negative
    forces must equal the dense Student-t negative forces."""
    from spark_tsne_spark.sptree import FlatTree, non_edge_forces

    rng = np.random.default_rng(seed)
    n = 60
    Y = rng.standard_normal((n, 2))
    tree = FlatTree.build(Y)
    negF, sumQ = non_edge_forces(tree, Y, theta=0.0)
    diff = Y[:, None, :] - Y[None, :, :]
    d2 = (diff * diff).sum(-1)
    qz = 1.0 / (1.0 + d2)
    np.fill_diagonal(qz, 0.0)
    expect_sumQ = qz.sum(axis=1)
    expect_negF = (qz * qz)[:, :, None].__mul__(diff).sum(axis=1)
    assert np.allclose(sumQ, expect_sumQ, rtol=1e-10)
    assert np.allclose(negF, expect_negF, rtol=1e-10)


_netpbm_payloads = st.one_of(
    st.binary(max_size=200),
    # adversarial: valid-looking magic + arbitrary header/raster bytes
    st.tuples(
        st.sampled_from([b"P5", b"P6"]),
        st.binary(max_size=100),
    ).map(lambda t: t[0] + t[1]),
    # well-formed headers with arbitrary truncation points
    st.tuples(
        st.sampled_from([b"P5", b"P6"]),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=300),
        st.binary(max_size=120),
        st.integers(min_value=0, max_value=140),
    ).map(
        lambda t: (t[0] + f"\n{t[1]} {t[2]}\n{t[3]}\n".encode() + t[4])[: 10 + t[5]]
    ),
)


_wav_payloads = st.one_of(
    st.binary(max_size=200),
    st.tuples(
        st.sampled_from([b"RIFF", b"RIFX", b"OggS"]),
        st.binary(max_size=120),
    ).map(lambda t: t[0] + t[1]),
    # RIFF/WAVE skeleton with arbitrary chunk soup + truncation
    st.tuples(st.binary(max_size=120), st.integers(min_value=0, max_value=130))
    .map(lambda t: (b"RIFF\x24\x00\x00\x00WAVE" + t[0])[: 12 + t[1]]),
)


@settings(max_examples=500, deadline=None)
@given(_wav_payloads)
def test_wav_parser_total(payload):
    """parse_wav is TOTAL over arbitrary bytes: PCM16-mono WAVs give
    (rate, int16 array), everything else gives None — never raises."""
    from spark_tsne_spark.sources.multimodal import parse_wav

    out = parse_wav(bytes(payload))
    if out is not None:
        sr, s = out
        assert isinstance(sr, int)
        assert s.dtype == np.int16


@settings(max_examples=500, deadline=None)
@given(_netpbm_payloads)
def test_netpbm_parser_total(payload):
    """The netpbm decoder is TOTAL over arbitrary bytes: every input
    either parses to a well-shaped uint8 grid or returns None — it
    must never raise inside a Spark task (the decode kernels run it
    on untrusted payload columns)."""
    from spark_tsne_spark.sources.multimodal import parse_netpbm

    out = parse_netpbm(bytes(payload))
    if out is not None:
        assert out.ndim == 2
        assert out.dtype == np.uint8
        assert out.shape[0] > 0 and out.shape[1] > 0


_jpeg_payloads = st.one_of(
    st.binary(max_size=300),
    # SOI + arbitrary marker soup
    st.tuples(st.binary(max_size=200)).map(lambda t: b"\xff\xd8" + t[0]),
    # a real encoded JPEG with an arbitrary truncation/corruption point
    st.tuples(
        st.integers(min_value=0, max_value=400),
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=400),
    ).map(
        lambda t: (lambda buf: buf[: t[2]] + bytes([t[1]]) + buf[t[2] + 1 :])(
            __import__(
                "spark_tsne_spark.sources.jpeg", fromlist=["make_jpeg"]
            ).make_jpeg(
                np.full((16, 16), t[0] % 256, dtype=np.uint8)
            )
        )
    ),
)


@settings(max_examples=300, deadline=None)
@given(_jpeg_payloads)
def test_jpeg_parser_total(payload):
    """parse_jpeg is TOTAL over arbitrary bytes — including real
    streams with one corrupted byte anywhere: well-shaped uint8 image
    or None, never an exception inside a Spark task."""
    from spark_tsne_spark.sources.jpeg import parse_jpeg

    out = parse_jpeg(bytes(payload))
    if out is not None:
        assert out.dtype == np.uint8
        assert out.ndim in (2, 3)


bloom_keys = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=200
)


@settings(max_examples=150, deadline=None)
@given(
    bloom_keys,
    bloom_keys,
    st.sampled_from([64, 1 << 10, 1 << 16]),
    st.integers(min_value=1, max_value=8),
)
def test_bloom_bitmap_never_false_negative(build, probe, m_bits, k):
    """The Bloom membership kernel (the pure-numpy core of
    ``joins.bloom_semijoin``) must NEVER reject a key that was
    inserted — for any key set, bitmap size, or hash count, including
    negative int64 keys (the uint64 wrap path)."""
    from spark_tsne_spark.operators import joins as J

    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    bk = np.array(build, dtype=np.int64)
    J._set_bits(bitmap, J._positions(bk, m_bits, k))
    pk = np.array(probe + build, dtype=np.int64)
    pos = J._positions(pk, m_bits, k)
    member = np.ones(len(pk), dtype=bool)
    for i in range(k):
        p = pos[:, i]
        member &= (bitmap[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
    in_build = np.isin(pk, bk)
    assert member[in_build].all()


@settings(max_examples=150, deadline=None)
@given(bloom_keys, st.integers(min_value=1, max_value=8))
def test_bloom_positions_deterministic_and_in_range(keys, k):
    """Hash positions are a pure function of the key (stable across
    calls — the property that lets build and probe run in different
    tasks) and always land inside the bitmap."""
    from spark_tsne_spark.operators import joins as J

    m_bits = 1 << 12
    a = np.array(keys, dtype=np.int64)
    p1 = J._positions(a, m_bits, k)
    p2 = J._positions(a.copy(), m_bits, k)
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < m_bits
