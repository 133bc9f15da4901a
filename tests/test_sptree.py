"""SPTree invariants — port of the reference's only rigorous suite
(``SPTreeSpec.scala``) plus property-style randomized checks
(FIXTURES.md F3)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from spark_tsne_spark.sptree import SPTree, non_edge_forces


def make_empty():
    return SPTree(2, np.array([0.0, 0.0]), np.array([2.0, 4.0]))


def test_child_count_and_width():
    t = make_empty()
    assert len(t.children) == 4
    for c in t.children:
        assert np.allclose(c.width, [1.0, 2.0])


def test_child_corner_order():
    # pinned by SPTreeSpec.scala:19-26 — dim 0 is the most significant bit
    t = make_empty()
    corners = [tuple(c.corner) for c in t.children]
    assert corners == [(0.0, 0.0), (0.0, 2.0), (1.0, 0.0), (1.0, 2.0)]


@pytest.mark.parametrize(
    "point,expected_corner",
    [
        ((1.0, 1.0), (0.0, 0.0)),
        ((1.5, 1.5), (1.0, 0.0)),
        ((2.0, 2.0), (1.0, 0.0)),
        ((2.0, 2.5), (1.0, 2.0)),
    ],
)
def test_cell_routing_boundaries(point, expected_corner):
    # pinned by SPTreeSpec.scala:27-32
    t = make_empty()
    cell = t.get_cell(np.array(point))
    assert tuple(cell.corner) == expected_corner


def verify_correctness(node):
    """Recursive invariant checker (port of SPTreeSpec.scala:49-61)."""
    if node.count > 0:
        assert np.allclose(node.center, node.total_mass / node.count)
    if node.count <= 1:
        assert node.leaf
    if node.leaf:
        assert node._children is None or all(c.count == 0 for c in node._children)
    if node._children is not None and not node.leaf:
        assert sum(c.count for c in node._children) == node.count
        child_mass = sum(c.total_mass.sum() for c in node._children)
        assert abs(child_mass - node.total_mass.sum()) < 1e-5
        for c in node._children:
            verify_correctness(c)


def test_build_with_duplicates():
    # FIXTURES.md F3(b): 8 points incl. exact duplicates
    pts = np.array(
        [[1, 3], [1, 1], [1, 2], [2, 2], [1.1, 1.1], [1.11, 1.11], [1.11, 1.11], [1, 1]],
        dtype=np.float64,
    )
    tree = SPTree.from_matrix(pts)
    assert tree.count == 8
    verify_correctness(tree)


def test_build_constant_dimension():
    """Points differing in only one coordinate: the constant dimension
    gives child_width 0 and a 0/0 = NaN routing ratio. The reference
    tolerates this (NaN.toInt == 0); the object tree must route it as
    digit 0, not raise ValueError from math.ceil(nan)."""
    pts = np.array([[1.0, 5.0], [2.0, 5.0], [3.0, 5.0], [1.5, 5.0]])
    tree = SPTree.from_matrix(pts)
    assert tree.count == 4
    verify_correctness(tree)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=10_000),
)
def test_random_build_invariants(n, d, seed):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, d))
    if seed % 3 == 0:
        pts[n // 2] = pts[0]  # inject a duplicate
    tree = SPTree.from_matrix(pts)
    assert tree.count == n
    verify_correctness(tree)


def test_theta_zero_matches_exact_forces():
    """θ→0 walk must converge to the exact negative forces."""
    rng = np.random.default_rng(7)
    Y = rng.standard_normal((60, 2))
    tree = SPTree.from_matrix(Y)
    negF, sumQ = non_edge_forces(tree, Y, theta=0.0)
    # exact computation
    d2 = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    qnum = 1.0 / (1.0 + d2)
    np.fill_diagonal(qnum, 0.0)
    exact_sumQ = qnum.sum(axis=1)
    exact_negF = np.einsum("ij,ijk->ik", qnum * qnum, Y[:, None, :] - Y[None, :, :])
    assert np.allclose(sumQ, exact_sumQ, atol=1e-9)
    assert np.allclose(negF, exact_negF, atol=1e-9)


def test_theta_half_approximates_exact():
    rng = np.random.default_rng(11)
    Y = rng.standard_normal((200, 2)) * 5
    tree = SPTree.from_matrix(Y)
    negF, sumQ = non_edge_forces(tree, Y, theta=0.5)
    d2 = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    qnum = 1.0 / (1.0 + d2)
    np.fill_diagonal(qnum, 0.0)
    assert np.abs(sumQ.sum() - qnum.sum()) / qnum.sum() < 0.05


def test_flat_tree_matches_object_tree():
    """FlatTree walk must visit the same cells with the same accept
    decisions as the object-tree walk at any θ. The flat walk is
    level-synchronous, so float accumulation ORDER differs — tolerance
    covers exactly that (contributions themselves are identical)."""
    from spark_tsne_spark.sptree import FlatTree

    rng = np.random.default_rng(13)
    Y = rng.standard_normal((300, 2)) * 3
    Y[5] = Y[17]  # duplicate point exercises leaf-count semantics
    tree = SPTree.from_matrix(Y)
    flat = FlatTree.from_sptree(tree)
    for theta in (0.0, 0.5, 1.2):
        negF_o, sumQ_o = non_edge_forces(tree, Y, theta)
        negF_f, sumQ_f = non_edge_forces(flat, Y, theta)
        assert np.allclose(sumQ_o, sumQ_f, rtol=1e-10, atol=1e-12)
        assert np.allclose(negF_o, negF_f, rtol=1e-10, atol=1e-10)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=2, max_value=200),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=10_000),
)
def test_bfs_build_walk_matches_object_tree(n, d, seed):
    """The BFS bulk build must produce walk-equivalent trees to the
    insert-built object tree for any point set (duplicates included).
    Node COUNTS differ by design — the object tree materializes all
    2^d sibling cells, the bulk build only occupied ones — but empty
    cells contribute nothing to any walk."""
    from spark_tsne_spark.sptree import FlatTree

    rng = np.random.default_rng(seed)
    Y = rng.standard_normal((n, d))
    if seed % 3 == 0:
        Y[n // 2] = Y[0]
    flat = FlatTree.build(Y)
    obj = SPTree.from_matrix(Y)
    assert flat.count[0] == n
    for theta in (0.0, 0.7):
        negF_o, sumQ_o = non_edge_forces(obj, Y, theta)
        negF_f, sumQ_f = non_edge_forces(flat, Y, theta)
        assert np.allclose(sumQ_o, sumQ_f, rtol=1e-9, atol=1e-9)
        assert np.allclose(negF_o, negF_f, rtol=1e-9, atol=1e-9)
