"""Robust Random Cut Forest — self-contained implementation of the
public algorithm (Guha, Mishra, Roy, Schrijvers: "Robust Random Cut
Forest Based Anomaly Detection on Streams", ICML 2016).

This backs the `anomaly_detector` processor's `random_cut_forest` mode
(reference: anomaly-detector-processor/.../modes/RandomCutForestMode.java:
32-53, which wraps the AWS RCF library).  Same externally visible
behavior: per identification-key group, events in time order are
shingled, scored against the forest BEFORE being inserted
(score-then-update), and the oldest point is forgotten once the sliding
sample window is full.

Scoring is collusive displacement (CoDisp): walking from the point's
leaf toward the root, the max over ancestors of |sibling subtree| /
|subtree so far| — the expected number of points whose model complexity
the candidate displaces.  An isolated outlier sits near the root behind
short cuts, so its siblings are large → high CoDisp; a point inside a
dense cluster needs many cuts to isolate → CoDisp ≈ 1.

Execution shape: the algorithm is inherently sequential per key (every
score depends on the forest state left by all prior events of that key),
so it runs inside ``applyInPandas`` — one Python pass per key group,
numpy vectors for the shingles.  That is the same per-event cost center
the reference pays in Java; at scale the parallelism axis is the number
of identification keys, which is exactly how the reference shards too
(hash ring on the identification keys).  Determinism: each (key, tree)
pair gets a counter-based seeded RNG, so scores are reproducible across
runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

import numpy as np


class _Leaf:
    __slots__ = ("x", "parent", "n")

    def __init__(self, x, parent=None):
        self.x = x
        self.parent = parent
        self.n = 1


class _Branch:
    __slots__ = ("dim", "cut", "l", "r", "parent", "n")

    def __init__(self, dim, cut, l, r, parent=None):
        self.dim = dim
        self.cut = cut
        self.l = l
        self.r = r
        self.parent = parent
        self.n = l.n + r.n


class RandomCutTree:
    """One random-cut tree over a sliding window of shingle points."""

    def __init__(self, rng: np.random.Generator):
        self.rng = rng
        self.root = None

    # ----------------------------------------------------------- helpers
    def _bbox(self, node):
        """Bounding box of a subtree (computed on demand; windows are
        small — ≤ sample_size points — so the walk is cheap)."""
        if isinstance(node, _Leaf):
            return node.x.copy(), node.x.copy()
        lmin, lmax = self._bbox(node.l)
        rmin, rmax = self._bbox(node.r)
        return np.minimum(lmin, rmin), np.maximum(lmax, rmax)

    def _replace(self, old, new):
        p = old.parent
        new.parent = p
        if p is None:
            self.root = new
        elif p.l is old:
            p.l = new
        else:
            p.r = new

    # ------------------------------------------------------------ insert
    def insert(self, x: np.ndarray) -> _Leaf:
        """InsertPoint (paper fig. 4): at each level draw a random cut
        over the box grown to include x; if the cut separates x from the
        existing box, split here, else recurse into the side of the
        existing cut."""
        if self.root is None:
            leaf = _Leaf(x)
            self.root = leaf
            return leaf
        node = self.root
        while True:
            bmin, bmax = self._bbox(node)
            nmin, nmax = np.minimum(bmin, x), np.maximum(bmax, x)
            span = nmax - nmin
            total = float(span.sum())
            if total <= 0.0:
                # duplicate of an all-equal box: attach beside this node
                # with a zero-width cut on dim 0
                leaf = _Leaf(x)
                branch = _Branch(0, float(nmin[0]), leaf, node)
                self._replace(node, branch)
                node.parent = branch
                leaf.parent = branch
                q = branch.parent
                while q is not None:
                    q.n += 1
                    q = q.parent
                return leaf
            r = self.rng.uniform(0.0, total)
            acc = np.cumsum(span)
            dim = int(np.searchsorted(acc, r, side="right"))
            dim = min(dim, len(span) - 1)
            prev = float(acc[dim - 1]) if dim > 0 else 0.0
            cut = float(nmin[dim]) + (r - prev)
            if cut < float(bmin[dim]) or cut >= float(bmax[dim]):
                # the cut separates x from the old box → split here
                leaf = _Leaf(x)
                if x[dim] <= cut:
                    branch = _Branch(dim, cut, leaf, node)
                else:
                    branch = _Branch(dim, cut, node, leaf)
                self._replace(node, branch)
                node.parent = branch
                leaf.parent = branch
                q = branch.parent
                while q is not None:
                    q.n += 1
                    q = q.parent
                return leaf
            if isinstance(node, _Leaf):
                # box is a single (equal) point yet cut fell inside: only
                # possible through float edge cases — attach beside
                leaf = _Leaf(x)
                branch = _Branch(dim, cut, leaf, node) if x[dim] <= cut else _Branch(dim, cut, node, leaf)
                self._replace(node, branch)
                node.parent = branch
                leaf.parent = branch
                q = branch.parent
                while q is not None:
                    q.n += 1
                    q = q.parent
                return leaf
            node = node.l if x[node.dim] <= node.cut else node.r

    # ------------------------------------------------------------ forget
    def forget(self, leaf: _Leaf) -> None:
        """ForgetPoint: collapse the leaf's parent into its sibling."""
        p = leaf.parent
        if p is None:
            self.root = None
            return
        sib = p.r if p.l is leaf else p.l
        self._replace(p, sib)
        q = sib.parent
        while q is not None:
            q.n -= 1
            q = q.parent

    # ------------------------------------------------------------ codisp
    def codisp(self, x: np.ndarray) -> float:
        """Expected collusive displacement of a NOT-yet-inserted point,
        deterministically (no RNG consumed — scoring must not perturb the
        forest's update stream).

        Walking the path x would take: at each subtree, the probability
        that a random cut over the x-grown bounding box separates x is
        p = extra_span / grown_span (the paper's insertion rule); if
        separated there, x's new leaf's sibling is the WHOLE current
        subtree → displacement node.n.  Accumulate Σ p·node.n over the
        path weighted by the probability of reaching that level
        unseparated; a point that descends all the way co-locates with
        existing structure and contributes the classic max-over-ancestors
        sibling/|subtree| ratio.  Outliers score ≈ |window|, interior
        points ≈ 1."""
        node = self.root
        if node is None or isinstance(node, _Leaf):
            return 0.0
        score = 0.0
        stay = 1.0
        base = 1.0
        while isinstance(node, _Branch):
            bmin, bmax = self._bbox(node)
            grown = float((np.maximum(bmax, x) - np.minimum(bmin, x)).sum())
            old = float((bmax - bmin).sum())
            if grown > 0.0:
                p = (grown - old) / grown
                score += stay * p * node.n
                stay *= 1.0 - p
            nxt = node.l if x[node.dim] <= node.cut else node.r
            sib = node.r if nxt is node.l else node.l
            base = max(base, sib.n / max(nxt.n, 1))
            node = nxt
        return score + stay * base


class RandomCutForest:
    """Fixed-size sliding-window forest (score-then-update)."""

    def __init__(
        self,
        dim: int,
        num_trees: int = 15,
        window_size: int = 128,
        seed: int = 42,
        key_salt: int = 0,
    ):
        self.trees = [
            RandomCutTree(np.random.default_rng([seed, t, key_salt & 0x7FFFFFFF]))
            for t in range(num_trees)
        ]
        self.window_size = window_size
        self._fifo: list[list[_Leaf]] = []  # per point: its leaf in each tree

    def score(self, x: np.ndarray) -> float:
        return float(np.mean([t.codisp(x) for t in self.trees]))

    def update(self, x: np.ndarray) -> None:
        leaves = [t.insert(x) for t in self.trees]
        self._fifo.append(leaves)
        if len(self._fifo) > self.window_size:
            old = self._fifo.pop(0)
            for t, leaf in zip(self.trees, old):
                t.forget(leaf)
