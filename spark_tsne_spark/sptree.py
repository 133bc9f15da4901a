"""SPTree — 2^d-ary space-partitioning tree for Barnes-Hut t-SNE.

Behavioral re-implementation of the reference's tree
(``SPTree.scala:9-79``), driver-built each iteration and broadcast
to executors. Semantics pinned by the reference's own test suite
(``SPTreeSpec.scala``) and replicated here:

- lazy 2^d children; child ``i``'s corner = corner + bits(i)∘(width/2)
  with dimension 0 as the most significant bit (``SPTree.scala:19-26``)
- cell routing per dim: ``min(max(ceil((v−corner)/childWidth)−1, 0), 1)``
  folded as binary digits (``SPTree.scala:53-56``)
- a leaf holds ≤1 *distinct* point; duplicates stay counted in one
  leaf; on the 2nd distinct point the held point is re-inserted
  count−1 times and the node subdivides (``SPTree.scala:28-44``)
- ``radius_sq = Σ width²`` — the (nonstandard, quirk Q5) quantity used
  by the Barnes-Hut acceptance test ``radius_sq/dist_sq < θ``
  (``SPTree.scala:13``, ``TSNEGradient.scala:128``)
"""

from __future__ import annotations

import math

import numpy as np


class SPTree:
    """One node of the space-partitioning tree."""

    __slots__ = (
        "dimension",
        "corner",
        "width",
        "child_width",
        "radius_sq",
        "total_mass",
        "count",
        "leaf",
        "center",
        "_children",
    )

    def __init__(self, dimension: int, corner: np.ndarray, width: np.ndarray):
        self.dimension = dimension
        self.corner = np.asarray(corner, dtype=np.float64)
        self.width = np.asarray(width, dtype=np.float64)
        self.child_width = self.width / 2.0
        self.radius_sq = float((self.width**2).sum())
        self.total_mass = np.zeros(dimension)
        self.count = 0
        self.leaf = True
        self.center = np.zeros(dimension)
        self._children: list[SPTree] | None = None

    # -- structure ---------------------------------------------------------

    @property
    def children(self) -> list["SPTree"]:
        """Lazily materialized 2^d children, corner order as pinned by
        the reference's spec (dim 0 = most significant bit)."""
        if self._children is None:
            kids = []
            for i in range(2**self.dimension):
                bits = np.array(
                    [(i >> (self.dimension - 1 - k)) & 1 for k in range(self.dimension)],
                    dtype=np.float64,
                )
                kids.append(
                    SPTree(self.dimension, self.corner + bits * self.child_width, self.child_width)
                )
            self._children = kids
        return self._children

    def get_cell(self, v: np.ndarray) -> "SPTree":
        """Route a point to the child cell that contains it."""
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = (v - self.corner) / self.child_width
        # A subdividing cell with a zero-width dimension yields 0/0 = NaN
        # (point on the corner); the reference tolerates it (NaN.toInt == 0,
        # SPTree.scala getCellIndex). Mirror FlatTree.build: NaN → 0,
        # ±inf → clamped finite, so math.ceil never sees a non-finite.
        ratio = np.nan_to_num(ratio)
        idx = 0
        for k in range(self.dimension):
            digit = min(max(math.ceil(ratio[k]) - 1, 0), 1)
            idx = idx * 2 + digit
        return self.children[idx]

    def is_leaf(self) -> bool:
        return self.leaf

    def get_count(self) -> int:
        return self.count

    # -- build -------------------------------------------------------------

    def insert(self, v: np.ndarray) -> "SPTree":
        """Insert one point (mass/count accumulate at every level)."""
        node = self
        while True:
            node.total_mass += v
            node.count += 1
            if node.leaf:
                if node.count == 1:
                    node.center = v.copy()
                    return node
                if not np.array_equal(v, node.center):
                    held, held_n = node.center, node.count - 1
                    for _ in range(held_n):
                        node.get_cell(held).insert(held)
                    node.leaf = False
            if node.leaf:
                return node
            node = node.get_cell(v)
            # loop continues: descend into the child

    def compute_center(self, recursive: bool = True) -> None:
        """Finalize centers of mass after a bulk insert
        (``SPTree.scala:46-51``)."""
        if self.count > 0:
            self.center = self.total_mass / self.count
            if recursive and self._children is not None:
                for c in self._children:
                    c.compute_center()

    @classmethod
    def from_matrix(cls, Y: np.ndarray) -> "SPTree":
        """Bounding-box + bulk-insert + one center pass
        (``SPTree.apply``, ``SPTree.scala:64-78``)."""
        Y = np.asarray(Y, dtype=np.float64)
        mins = Y.min(axis=0)
        maxs = Y.max(axis=0)
        tree = cls(Y.shape[1], mins, maxs - mins)
        for i in range(Y.shape[0]):
            tree.insert(Y[i])
        tree.compute_center()
        return tree


class FlatTree:
    """Array-of-nodes serialization of an :class:`SPTree`.

    The object tree costs ~0.5 KB/node to pickle and unpickles node by
    node; at one broadcast per t-SNE iteration that dominates the
    per-iteration wire cost. The flat form is six numpy arrays
    (~70 B/node), unpickles in O(1) allocations, and the walk reads
    node attributes with array indexing. Semantics are identical —
    :func:`non_edge_forces` accepts either form.

    COARSE LEAVES (``leaf_size`` > 1 in :meth:`build`): subdivision
    stops once a cell holds ≤ leaf_size points, and the cell stores
    its member points (``leaf_start`` into the packed ``leaf_pts``
    rows). The walk treats a coarse leaf like any cell when the θ
    criterion accepts it; when it does NOT, the leaf's points are
    accumulated EXACTLY (each its own Student-t term, self excluded
    by the same dist>0 rule) — i.e. strictly MORE accurate than the
    fine tree, which would θ-approximate sub-cells there. Purpose:
    the driver rebuilds this tree every iteration, and at 10⁷ points
    the fine build is the serial bottleneck (52.7 s measured,
    SCALE.md r11) with a ~850 MB broadcast; leaf_size=32 cuts nodes
    ~16× and the build to seconds. ``leaf_size=1`` (default) is the
    reference-exact round-10 structure bit-for-bit.
    """

    __slots__ = (
        "center", "count", "radius_sq", "leaf", "children", "n_nodes",
        "leaf_start", "leaf_pts",
    )

    def __init__(
        self, center, count, radius_sq, leaf, children,
        leaf_start=None, leaf_pts=None,
    ):
        self.center = center
        self.count = count
        self.radius_sq = radius_sq
        self.leaf = leaf
        self.children = children
        self.n_nodes = len(count)
        if leaf_start is None:
            leaf_start = np.full(self.n_nodes, -1, dtype=np.int64)
        if leaf_pts is None:
            leaf_pts = np.empty((0, center.shape[1] if center.ndim == 2 else 0))
        self.leaf_start = leaf_start
        self.leaf_pts = leaf_pts

    @classmethod
    def from_sptree(cls, root: SPTree) -> "FlatTree":
        """Flatten (preorder); children of empty/leaf nodes are -1."""
        n_child = 2**root.dimension
        centers, counts, radii, leaves, children = [], [], [], [], []
        stack = [root]
        order: list[SPTree] = []
        while stack:
            node = stack.pop()
            order.append(node)
            if node._children is not None:
                stack.extend(node._children)
        index = {id(node): k for k, node in enumerate(order)}
        for node in order:
            centers.append(node.center)
            counts.append(node.count)
            radii.append(node.radius_sq)
            leaves.append(node.leaf)
            if node._children is not None:
                children.append([index[id(c)] for c in node._children])
            else:
                children.append([-1] * n_child)
        return cls(
            np.asarray(centers, dtype=np.float64),
            np.asarray(counts, dtype=np.int64),
            np.asarray(radii, dtype=np.float64),
            np.asarray(leaves, dtype=bool),
            np.asarray(children, dtype=np.int32),
        )

    @classmethod
    def from_matrix(cls, Y: np.ndarray) -> "FlatTree":
        return cls.build(Y)

    # Rows at which `build(method="auto")` switches from the
    # level-sort builder to the Morton builder. The two emit
    # BIT-IDENTICAL structure (counts, children, leaves, radii,
    # leaf_start, leaf_pts — pinned in tests/test_r12_fixes.py); only
    # the center-of-mass floats differ at ~1-2 ulp, because per-node
    # sums accumulate in a different order (reduceat's unrolled
    # pairwise blocks vs bincount's strict sequential adds). Ulp noise
    # is far below the θ-approximation error, but value-pinned golden
    # trajectories (tsne_embedding at sf0.01) are chaotic over
    # iterations, so small builds — where the level-sort builder takes
    # milliseconds anyway — keep the round-11 bit pattern, and Morton
    # engages where the build is the measured driver bottleneck
    # (crossover measured in SCALE.md r12).
    MORTON_MIN_ROWS = 200_000

    @classmethod
    def build(
        cls,
        Y: np.ndarray,
        max_depth: int = 64,
        leaf_size: int = 1,
        method: str = "auto",
    ) -> "FlatTree":
        """Morton-order bulk build — ONE sort per ~31 tree levels
        instead of two per level.

        The round-11 level-synchronous builder (kept verbatim as
        :meth:`_build_level_sort`; it remains the equivalence oracle
        in tests) paid per level: an ``argsort`` of the active keys, a
        second full sort inside ``np.unique``, and a random-access
        gather ``Y[spts]`` — at 10⁷ points that is the measured
        driver-side bottleneck of the BH iteration (44.3 s/build
        coarse, SCALE.md r11; the passes are level-bound, not
        node-bound). This builder removes all three: per SUPER-STEP it
        computes up to ~``62/d`` levels of cell digits for every
        active row (identical float arithmetic to the per-level rule:
        ``clip(ceil((v−corner)/childWidth)−1, 0, 1)`` with the same
        NaN→1 fold, corners accumulated by the same multiply-add),
        packs them into one integer Morton key, sorts ONCE, and then
        derives every level's nodes by bit-slicing the sorted keys —
        run boundaries are adjacent-prefix comparisons, O(active) per
        level with no sort.

        Output STRUCTURE is BIT-IDENTICAL to the level-sort builder
        (pinned in ``tests/test_r12_fixes.py`` across duplicates,
        mega-clusters, zero-width dims, depth cutoffs and
        multi-super-step inputs): node numbering (both emit levels in
        BFS order and, within a level, in ascending (parent, cell)
        order — which IS ascending Morton-prefix order), counts,
        children, leaf flags, radii, leaf membership. Two float-level
        differences are accepted by design (and why ``"auto"``
        dispatches on size — see ``MORTON_MIN_ROWS``): centers differ
        at ~1-2 ulp (per-node sums accumulate over Morton-ordered
        rows instead of original-index-ordered ones — a first draft
        that replayed the original summation order via a second
        per-point view measured SLOWER than the level-sort builder it
        was meant to replace, 0.63-0.86×, and was still not bit-equal
        because ``reduceat``'s unrolled pairwise blocks round
        differently from any sequential order), and coarse-leaf rows
        pack in Morton order rather than original-index order (same
        multiset per leaf; only walk-expansion ADDITION order, i.e.
        more ulps). The distinct-point test (old: ``gmin == gmax``
        reduceat) is an adjacent-equality chain over the sorted rows
        — equivalent with zero float ops.

        The level loop never copies the row arrays: retired rows get
        a ``-1`` key sentinel (codes use ≤62 low bits, so -1 is
        unreachable), dead runs are skipped by a per-run validity
        mask, and the arrays compact ONCE when the alive fraction
        drops below half — so a level costs a handful of O(m)
        passes and the whole build is one sort plus ~2× the data in
        streaming traffic.

        Degenerate inputs needing more than ``62//d`` levels (points
        closer than the key resolution) roll into the next super-step:
        still-splitting groups carry their corners forward and get a
        fresh key; ``max_depth`` bounds the total as before.

        ``leaf_size`` semantics are unchanged from round 11 (see the
        class docstring); the default 1 reproduces the reference-exact
        structure bit-for-bit.

        ``method``: ``"auto"`` (default) picks Morton at or above
        ``MORTON_MIN_ROWS`` and the level-sort builder below (see the
        constant's comment for the ulp/bit-compat rationale);
        ``"morton"`` / ``"level"`` force a builder.
        """
        Y = np.asarray(Y, dtype=np.float64)
        n, dim = Y.shape
        if method == "auto":
            method = "morton" if n >= cls.MORTON_MIN_ROWS else "level"
        if method == "level" or dim > 20:  # 2^dim fan-out; Morton
            # key packing gains nothing at very high dim
            return cls._build_level_sort(Y, max_depth, leaf_size)
        n_child = 2**dim
        mins = Y.min(axis=0)
        maxs = Y.max(axis=0)
        root_width = maxs - mins
        coarse = int(leaf_size) > 1
        ls_slots: list[np.ndarray] = []
        ls_counts: list[np.ndarray] = []
        ls_rows: list[np.ndarray] = []

        center_lv: list[np.ndarray] = [(Y.sum(axis=0) / n)[None, :]]
        count_lv: list[np.ndarray] = [np.array([n], dtype=np.int64)]
        radius_lv: list[np.ndarray] = [
            np.array([(root_width * root_width).sum()], dtype=np.float64)
        ]
        # children wiring as flat (parent slot, cell, kid slot)
        # triples, scattered once at the end
        par_fix: list[np.ndarray] = []
        cell_fix: list[np.ndarray] = []
        kid_fix: list[np.ndarray] = []
        total_slots = 1

        all_same = bool((Y == Y[0]).all())
        root_is_leaf = (
            all_same or max_depth <= 0 or (coarse and n <= int(leaf_size))
        )
        if root_is_leaf and coarse and not all_same:
            ls_slots.append(np.array([0], dtype=np.int64))
            ls_counts.append(np.array([n], dtype=np.int64))
            ls_rows.append(Y)

        # Residual state between super-steps: active rows, their
        # corners at the current depth, and their parent slot ids.
        if root_is_leaf:
            R_idx = np.array([], dtype=np.int64)
        else:
            R_idx = np.arange(n)
        R_corner = np.broadcast_to(mins, (len(R_idx), dim)).copy()
        R_gid = np.zeros(len(R_idx), dtype=np.int64)
        wl = root_width.copy()  # width of the R_gid nodes' cells
        glevel = 0  # levels completed (old builder's `depth`)
        max_lv = max(1, 62 // dim)  # key bit budget per super-step
        leaf_eff = int(leaf_size) if coarse else 1

        while R_idx.size:
            m = len(R_idx)
            Yr = Y[R_idx]
            # ---- phase 1: Morton keys for up to D0 levels ----------
            # The per-level digit rule clip(ceil(r)−1, 0, 1) with
            # NaN→1 is EXACTLY ~(r <= 1): r ≤ 1 (incl. −inf) → 0;
            # r > 1 (incl. +inf) → 1; NaN fails r ≤ 1 → 1. One
            # comparison replaces the ceil/clip/nan_to_num chain —
            # phase 1 was 18 of 24 s at 10M with the literal chain.
            D0 = int(np.ceil(np.log2(max(2.0, m / leaf_eff)) / dim)) + 2
            D0 = max(1, min(D0, max_lv, max_depth - glevel))
            codes = np.zeros(m, dtype=np.int64)
            corner = R_corner
            cw_seq = []  # child width vector per level (exact halving)
            w_cur = wl
            ratio = np.empty((m, dim), dtype=np.float64)
            db = np.empty((m, dim), dtype=bool)
            fb = np.empty((m, dim), dtype=np.float64)
            ib = np.empty(m, dtype=np.int64)
            for _ in range(D0):
                cw = w_cur / 2.0
                cw_seq.append(cw)
                np.subtract(Yr, corner, out=ratio)
                with np.errstate(divide="ignore", invalid="ignore"):
                    np.divide(ratio, cw, out=ratio)
                np.less_equal(ratio, 1.0, out=db)
                np.logical_not(db, out=db)
                np.left_shift(codes, dim, out=codes)
                for k in range(dim):
                    np.copyto(ib, db[:, k], casting="unsafe")
                    if dim - 1 - k:
                        np.left_shift(ib, dim - 1 - k, out=ib)
                    np.bitwise_or(codes, ib, out=codes)
                # corner += digit * child_width (same multiply-add the
                # level-sort builder applies per node)
                np.copyto(fb, db, casting="unsafe")
                np.multiply(fb, cw, out=fb)
                np.add(corner, fb, out=corner)
                w_cur = cw

            # ---- phase 2: one sort, then bit-sliced levels ---------
            # Tie order among EQUAL codes is immaterial (equal codes
            # ⇒ same node for all D0 levels; the identical test and
            # run membership are order-independent), so the default
            # introsort beats kind="stable" on the big first step.
            if R_gid.any():
                order = np.lexsort((codes, R_gid))
            else:  # first super-step: single group
                order = np.argsort(codes)
            scode = codes[order]
            sidx = R_idx[order]
            Ys = Yr[order]
            scorner = corner[order]
            sgid = R_gid[order]

            # Per-super-step precomputations that make each level a
            # single int8 comparison + one reduceat:
            # dl[i] = first level at which rows i-1 and i fall into
            # different runs (from the highest set bit of the code
            # XOR; super-step entry-group boundaries get 0). flag_lv
            # is then just (dl <= lv) — no per-level 64-bit shifts.
            dl = np.zeros(m, dtype=np.int16)
            if m > 1:
                x = scode[1:] ^ scode[:-1]
                hb = np.zeros(m - 1, dtype=np.int16)
                v = x.copy()
                for sh in (32, 16, 8, 4, 2, 1):
                    big = v >= (np.int64(1) << sh)
                    hb[big] += sh
                    v[big] >>= sh
                lvl = (np.int16(D0) - 1) - hb // np.int16(dim)
                lvl[x == 0] = np.int16(D0)  # never diverges in-step
                dl[1:] = lvl
                dl[1:][sgid[1:] != sgid[:-1]] = 0
            # breakpoints of the adjacent-equality chain: a run
            # [s, e) is all-identical iff no break lies in (s, e)
            eqR = np.ones(m, dtype=bool)
            eqR[0] = False
            if m > 1:
                eqR[1:] = (Ys[1:] == Ys[:-1]).all(axis=1)
            fe = np.flatnonzero(~eqR)
            fe = np.append(fe, m)

            # parent runs of the first level = entry groups
            starts_prev = np.flatnonzero(dl == 0)
            slot_prev = sgid[starts_prev]

            for lv in range(D0):
                shift = (D0 - 1 - lv) * dim
                flag = dl <= lv
                starts = np.flatnonzero(flag)
                mm = len(scode)
                sizes = np.diff(np.append(starts, mm))
                run_code = scode[starts]
                valid = run_code >= 0  # dead runs carry the sentinel

                sv = sizes[valid]
                Kv = int(valid.sum())
                kid_slot = total_slots + np.arange(Kv)
                prun = np.searchsorted(starts_prev, starts[valid], "right") - 1
                par_fix.append(slot_prev[prun])
                cell_fix.append(
                    (run_code[valid] >> shift) & (n_child - 1)
                )
                kid_fix.append(kid_slot)

                sums = np.add.reduceat(Ys, starts, axis=0)
                center_lv.append(sums[valid] / sv[:, None])
                count_lv.append(sv.astype(np.int64, copy=False))
                cw = cw_seq[lv]
                radius_lv.append(
                    np.full(Kv, (cw * cw).sum(), dtype=np.float64)
                )
                total_slots += Kv

                # identical ⇔ no equality break inside the run
                nb = fe[np.searchsorted(fe, starts, "right")]
                identical = nb >= starts + sizes

                if glevel + 1 < max_depth:
                    expand = valid & ~identical
                else:
                    expand = np.zeros(len(sizes), dtype=bool)
                if coarse:
                    expand &= sizes > int(leaf_size)
                    cmask = valid & ~identical & ~expand
                    if cmask.any():
                        # pack member rows (Morton order within leaf)
                        cs = starts[cmask]
                        cz = sizes[cmask]
                        tot = int(cz.sum())
                        within = np.arange(tot) - np.repeat(
                            np.cumsum(cz) - cz, cz
                        )
                        # slot ids: position among VALID runs
                        vpos = np.cumsum(valid) - 1
                        ls_slots.append(
                            total_slots - Kv + vpos[cmask]
                        )
                        ls_counts.append(cz)
                        ls_rows.append(Ys[np.repeat(cs, cz) + within])
                glevel += 1
                n_alive = int(sizes[expand].sum())
                last = n_alive == 0 or lv == D0 - 1
                # retire non-expanding VALID runs: segment-bounded
                # sentinel writes (dead runs already carry -1)
                ret = valid & ~expand
                if ret.any():
                    rs = starts[ret]
                    rz = sizes[ret]
                    tot = int(rz.sum())
                    within = np.arange(tot) - np.repeat(
                        np.cumsum(rz) - rz, rz
                    )
                    scode[np.repeat(rs, rz) + within] = -1
                if last:
                    # capture residual rows via expanded-run segments
                    es = starts[expand]
                    ez = sizes[expand]
                    tot = int(ez.sum())
                    within = np.arange(tot) - np.repeat(
                        np.cumsum(ez) - ez, ez
                    )
                    rows = np.repeat(es, ez) + within
                    R_idx = sidx[rows]
                    R_corner = scorner[rows]
                    vslot = np.full(len(sizes), -1, dtype=np.int64)
                    vslot[valid] = kid_slot
                    R_gid = np.repeat(vslot[expand], ez)
                    wl = cw
                    break
                starts_prev = starts[expand]
                slot_prev = kid_slot[expand[valid]]
                if n_alive < mm // 2:
                    # compact once the alive fraction halves; removals
                    # are whole runs, so surviving within-run
                    # adjacency (dl, eq breaks) stays valid, and every
                    # row after a removed block is a run start
                    am = scode >= 0
                    scode = scode[am]
                    sidx = sidx[am]
                    Ys = Ys[am]
                    scorner = scorner[am]
                    dl = dl[am]
                    dl[flag[am]] = 0  # run starts stay boundaries
                    eqR = eqR[am]
                    fe = np.append(np.flatnonzero(~eqR), len(scode))
                    starts_prev = np.flatnonzero(dl == 0)
                    # slot_prev aligns: compacted runs are exactly the
                    # expanded runs, in order
            if glevel >= max_depth:
                break

        leaves_arr = np.ones(total_slots, dtype=bool)
        children_arr = np.full((total_slots, n_child), -1, dtype=np.int32)
        if par_fix:
            pars = np.concatenate(par_fix)
            children_arr[pars, np.concatenate(cell_fix)] = np.concatenate(
                kid_fix
            )
            leaves_arr[pars] = False
        leaf_start_arr = None
        leaf_pts_arr = None
        if coarse:
            leaf_start_arr = np.full(total_slots, -1, dtype=np.int64)
            if ls_slots:
                counts_cat = np.concatenate(ls_counts)
                leaf_start_arr[np.concatenate(ls_slots)] = (
                    np.cumsum(counts_cat) - counts_cat
                )
                leaf_pts_arr = np.concatenate(ls_rows, axis=0)
        return cls(
            np.concatenate(center_lv, axis=0),
            np.concatenate(count_lv),
            np.concatenate(radius_lv),
            leaves_arr,
            children_arr,
            leaf_start_arr,
            leaf_pts_arr,
        )

    @classmethod
    def _build_level_sort(
        cls, Y: np.ndarray, max_depth: int = 64, leaf_size: int = 1
    ) -> "FlatTree":
        """Round-11 level-synchronous (BFS) builder — kept verbatim as
        the equivalence oracle for :meth:`build` (the Morton builder
        is pinned bit-identical to this in tests) and as the fallback
        for very high dimensions.

        The tree's *shape* is insertion-order independent: a cell is a
        leaf iff it holds ≤1 distinct point, and every node's
        mass/count is the sum over contained points. The builder
        advances one tree level per pass: ALL points of ALL nodes at
        the level are routed to child cells in one vectorized step
        using the reference's exact cell rule
        ``min(max(ceil((v−corner)/childWidth)−1, 0), 1)``
        (``SPTree.scala:53-56``); per-child counts/centers/extents come
        from ``reduceat`` over one sort. Python iteration count is
        O(tree depth), not O(nodes).

        ``max_depth`` guards the degenerate case of distinct points
        closer than float resolution of the repeatedly-halved cell
        (the insert path would recurse forever there too).

        ``leaf_size`` > 1 stops subdividing cells at ≤ leaf_size
        points and stores their member rows for the walk's exact
        expansion (see the class docstring); cells cut off by
        ``max_depth`` store their points too in that mode. The
        default (1) reproduces the reference-exact structure
        bit-for-bit.
        """
        Y = np.asarray(Y, dtype=np.float64)
        n, dim = Y.shape
        n_child = 2**dim
        mins = Y.min(axis=0)
        maxs = Y.max(axis=0)
        root_width = maxs - mins
        coarse = int(leaf_size) > 1
        ls_slots: list[np.ndarray] = []   # slot ids of coarse leaves
        ls_counts: list[np.ndarray] = []  # their point counts
        ls_rows: list[np.ndarray] = []    # their packed point rows

        # Per-LEVEL array accumulators (concatenated once at the end) —
        # per-node Python list appends made the build O(nodes) in
        # interpreter time, which at 50k points was ~3/4 of the 174 ms
        # driver build (the tree rebuilds EVERY iteration, so this is
        # pure per-iteration latency).
        center_lv: list[np.ndarray] = [(Y.sum(axis=0) / n)[None, :]]
        count_lv: list[np.ndarray] = [np.array([n], dtype=np.int64)]
        radius_lv: list[np.ndarray] = [
            np.array([(root_width * root_width).sum()], dtype=np.float64)
        ]
        # (slots, child-rows) per level, patched into the flat children
        # array after the loop; every patched slot is non-leaf.
        kidrow_fix: list[tuple[np.ndarray, np.ndarray]] = []
        total_slots = 1

        all_same = bool((Y == Y[0]).all())
        root_is_leaf = (
            all_same or max_depth <= 0 or (coarse and n <= int(leaf_size))
        )
        if root_is_leaf and coarse and not all_same:
            ls_slots.append(np.array([0], dtype=np.int64))
            ls_counts.append(np.array([n], dtype=np.int64))
            ls_rows.append(Y)
        if root_is_leaf:
            lv_pts = np.array([], dtype=np.int64)
            g_slot = np.array([], dtype=np.int64)
        else:
            lv_pts = np.arange(n)
            g_slot = np.array([0], dtype=np.int64)
        grp_of = np.zeros(len(lv_pts), dtype=np.int64)
        g_corner = mins[None, :].copy()
        g_width = root_width[None, :].copy()
        depth = 0
        bit_shifts = np.arange(dim - 1, -1, -1)

        while g_slot.size:
            child_width = g_width / 2.0
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = (Y[lv_pts] - g_corner[grp_of]) / child_width[grp_of]
            digits = np.clip(np.ceil(ratio) - 1, 0, 1)
            digits = np.nan_to_num(digits, nan=1.0).astype(np.int64)
            cell = np.zeros(len(lv_pts), dtype=np.int64)
            for k in range(dim):
                cell = cell * 2 + digits[:, k]
            key = grp_of * n_child + cell
            order = np.argsort(key, kind="stable")
            skey, spts = key[order], lv_pts[order]
            uniq, starts = np.unique(skey, return_index=True)
            sizes = np.diff(np.append(starts, len(skey)))
            K = len(uniq)
            kid_slot = total_slots + np.arange(K)
            parent_g = uniq // n_child
            cellno = uniq % n_child

            # children rows of the subdivided nodes (patched in at the end)
            rows = np.full((g_slot.size, n_child), -1, dtype=np.int64)
            rows[parent_g, cellno] = kid_slot
            kidrow_fix.append((g_slot, rows))

            # child metadata, all groups at once
            Ys = Y[spts]
            sums = np.add.reduceat(Ys, starts, axis=0)
            centers_k = sums / sizes[:, None]
            radius_k = (child_width[parent_g] ** 2).sum(axis=1)
            bits = ((cellno[:, None] >> bit_shifts[None, :]) & 1).astype(np.float64)
            corner_k = g_corner[parent_g] + bits * child_width[parent_g]
            gmin = np.minimum.reduceat(Ys, starts, axis=0)
            gmax = np.maximum.reduceat(Ys, starts, axis=0)
            identical = (gmin == gmax).all(axis=1)

            center_lv.append(centers_k)
            count_lv.append(sizes.astype(np.int64, copy=False))
            radius_lv.append(radius_k)
            total_slots += K

            # next level: children holding >1 distinct point, depth permitting
            expand = ~identical if depth + 1 < max_depth else np.zeros(K, dtype=bool)
            if coarse:
                expand = expand & (sizes > int(leaf_size))
                # coarse leaves: not expanded, not single-point — store
                # their member rows for the walk's exact expansion.
                # Ys is sorted by group, so rows per leaf stay
                # contiguous and ordered by slot id.
                cmask = ~identical & ~expand
                if cmask.any():
                    pos_all = np.repeat(np.arange(K), sizes)
                    ls_slots.append(kid_slot[cmask])
                    ls_counts.append(sizes[cmask])
                    ls_rows.append(Ys[cmask[pos_all]])
            if not expand.any():
                break
            pos_group = np.repeat(np.arange(K), sizes)
            keep = expand[pos_group]
            lv_pts = spts[keep]
            renum = np.cumsum(expand) - 1
            grp_of = renum[pos_group[keep]]
            g_slot = kid_slot[expand]
            g_corner = corner_k[expand]
            g_width = child_width[parent_g[expand]]
            depth += 1

        leaves_arr = np.ones(total_slots, dtype=bool)
        children_arr = np.full((total_slots, n_child), -1, dtype=np.int32)
        for slots, rows in kidrow_fix:  # O(depth) vectorized patches
            children_arr[slots] = rows
            leaves_arr[slots] = False
        leaf_start_arr = None
        leaf_pts_arr = None
        if coarse:
            leaf_start_arr = np.full(total_slots, -1, dtype=np.int64)
            if ls_slots:
                counts_cat = np.concatenate(ls_counts)
                leaf_start_arr[np.concatenate(ls_slots)] = (
                    np.cumsum(counts_cat) - counts_cat
                )
                leaf_pts_arr = np.concatenate(ls_rows, axis=0)
        return cls(
            np.concatenate(center_lv, axis=0),
            np.concatenate(count_lv),
            np.concatenate(radius_lv),
            leaves_arr,
            children_arr,
            leaf_start_arr,
            leaf_pts_arr,
        )


def _non_edge_forces_flat(
    tree: FlatTree, Yb: np.ndarray, theta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Level-synchronous subset walk over the flat arrays.

    Instead of visiting one node at a time (O(nodes) Python
    iterations), the frontier of *(node, point)* pairs advances one
    tree level per loop pass: every pair's accept test, contribution,
    and expansion happens in batched numpy (~2-3× the node-at-a-time
    walk; same accept rule, same contributions, accumulation order
    differs only in float rounding). Contributions scatter through
    ``np.bincount`` per output column.
    """
    k, d = Yb.shape
    negF = np.zeros((k, d))
    sumQ = np.zeros(k)
    C, cnt, rad, leaf, kids = (
        tree.center,
        tree.count,
        tree.radius_sq,
        tree.leaf,
        tree.children,
    )
    lstart = getattr(tree, "leaf_start", None)
    LP = getattr(tree, "leaf_pts", None)
    has_coarse = lstart is not None and LP is not None and len(LP) > 0
    nodes = np.zeros(k, dtype=np.int64)  # frontier pair i: node nodes[i] ...
    pts = np.arange(k)                   # ... walked for point pts[i]
    while nodes.size:
        diff = Yb[pts] - C[nodes]
        dist_sq = (diff * diff).sum(axis=1)
        nz = dist_sq > 0.0  # self-exclusion: a cell centered ON the point
        isleaf = leaf[nodes]
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = rad[nodes] / dist_sq < theta
        coarse = (
            isleaf & (lstart[nodes] >= 0) if has_coarse
            else np.zeros(len(nodes), dtype=bool)
        )
        # exact leaves always accepted; coarse leaves only on the θ
        # test — a rejected (or center-coincident) coarse leaf expands
        # to its member points below, each an EXACT Student-t term
        take = ((isleaf & ~coarse) | acc) & nz
        if take.any():
            tp, tn, td2 = pts[take], nodes[take], dist_sq[take]
            qZ = 1.0 / (1.0 + td2)
            nqZ = cnt[tn] * qZ
            sumQ += np.bincount(tp, weights=nqZ, minlength=k)
            w = nqZ * qZ
            dd = diff[take]
            for c in range(d):
                negF[:, c] += np.bincount(tp, weights=w * dd[:, c], minlength=k)
        expand = coarse & ~take
        if expand.any():
            en, ep = nodes[expand], pts[expand]
            cl = cnt[en]  # coarse leaf stores exactly its cnt rows
            total = int(cl.sum())
            rep_p = np.repeat(ep, cl)
            within = np.arange(total) - np.repeat(np.cumsum(cl) - cl, cl)
            flat = np.repeat(lstart[en], cl) + within
            ediff = Yb[rep_p] - LP[flat]
            ed2 = (ediff * ediff).sum(axis=1)
            enz = ed2 > 0.0  # per-point self/duplicate exclusion
            qZ = np.where(enz, 1.0 / (1.0 + ed2), 0.0)
            sumQ += np.bincount(rep_p, weights=qZ, minlength=k)
            w = qZ * qZ
            for c in range(d):
                negF[:, c] += np.bincount(
                    rep_p, weights=w * ediff[:, c], minlength=k
                )
        desc = ~take & ~isleaf  # not accepted, not a leaf → descend
        if not desc.any():
            break
        dn, dp = nodes[desc], pts[desc]
        ch = kids[dn]  # (m, 2^d); -1 marks empty cells
        flat_ch = ch.ravel().astype(np.int64)
        rep_p = np.repeat(dp, ch.shape[1])
        ok = flat_ch >= 0
        nodes, pts = flat_ch[ok], rep_p[ok]
        ne = cnt[nodes] > 0
        nodes, pts = nodes[ne], pts[ne]
    return negF, sumQ


def non_edge_forces(
    tree: "SPTree | FlatTree", Yb: np.ndarray, theta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Barnes-Hut negative forces + sumQ for a block of points.

    Point-at-a-time recursion in the reference
    (``TSNEGradient.computeNonEdgeForce``, ``TSNEGradient.scala:99-137``)
    becomes a node-at-a-time subset walk: at each node, all still-active
    points are tested against the acceptance criterion at once with
    numpy; the non-accepted subset descends. Same accept rule
    (leaf, or radius_sq/dist_sq < θ), same self-exclusion
    (leaf whose center equals the point contributes 0), same sumQ
    accumulation (count·qZ per accepted cell).

    Returns ``(negF [k×d], sumQ [k])``.
    """
    if isinstance(tree, FlatTree):
        return _non_edge_forces_flat(tree, Yb, theta)
    k, d = Yb.shape
    negF = np.zeros((k, d))
    sumQ = np.zeros(k)
    stack: list[tuple[SPTree, np.ndarray]] = [(tree, np.arange(k))]
    while stack:
        node, idx = stack.pop()
        if node.count == 0 or idx.size == 0:
            continue
        diff = Yb[idx] - node.center
        dist_sq = (diff * diff).sum(axis=1)
        if node.leaf:
            m = dist_sq > 0.0  # exclude the point itself (exact-equality leaf)
            sel, d2 = idx[m], dist_sq[m]
            qZ = 1.0 / (1.0 + d2)
            nqZ = node.count * qZ
            sumQ[sel] += nqZ
            negF[sel] += (nqZ * qZ)[:, None] * diff[m]
        else:
            with np.errstate(divide="ignore"):
                accept = node.radius_sq / dist_sq < theta
            accept &= dist_sq > 0.0
            sel, d2 = idx[accept], dist_sq[accept]
            if sel.size:
                qZ = 1.0 / (1.0 + d2)
                nqZ = node.count * qZ
                sumQ[sel] += nqZ
                negF[sel] += (nqZ * qZ)[:, None] * diff[accept]
            rest = idx[~accept]
            if rest.size and node._children is not None:
                for child in node._children:
                    stack.append((child, rest))
    return negF, sumQ
