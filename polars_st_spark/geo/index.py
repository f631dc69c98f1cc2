"""STR-packed R-tree over bounding boxes (numpy).

Plays the role of GEOS's STRtree in the reference's sjoin kernel
(reference: src/functions.rs:1804-1815): bulk-loaded once per partition,
probed per query geometry. Sort-Tile-Recursive packing, array-backed nodes.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["STRtree"]


class STRtree:
    """Bulk-loaded static R-tree.

    Parameters
    ----------
    bounds : (n, 4) float array of [xmin, ymin, xmax, ymax] per item.
            NaN rows (empty geometries) never match queries.
    """

    def __init__(self, bounds: np.ndarray, node_capacity: int = 16) -> None:
        bounds = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
        self.n = len(bounds)
        self.cap = node_capacity
        valid = ~np.isnan(bounds[:, 0])
        self.item_bounds = bounds
        idx = np.nonzero(valid)[0]
        if len(idx) == 0:
            self.levels = []
            return
        # STR packing: sort by x-center into vertical slices, then by y-center
        b = bounds[idx]
        cx = (b[:, 0] + b[:, 2]) / 2.0
        cy = (b[:, 1] + b[:, 3]) / 2.0
        n_leaf = math.ceil(len(idx) / node_capacity)
        n_slices = max(1, math.ceil(math.sqrt(n_leaf)))
        per_slice = math.ceil(len(idx) / n_slices)
        order = np.argsort(cx, kind="stable")
        leaf_item_order = []
        for s in range(n_slices):
            sl = order[s * per_slice : (s + 1) * per_slice]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            leaf_item_order.append(sl)
        order = np.concatenate(leaf_item_order)
        self.items = idx[order]  # item ids in leaf order
        ib = bounds[self.items]
        # build levels bottom-up: each node = bbox of `cap` consecutive children
        self.levels: list[np.ndarray] = []  # [0]=leaf nodes ... [-1]=root level
        cur = ib
        while len(cur) > 1:
            m = math.ceil(len(cur) / node_capacity)
            nodes = np.empty((m, 4))
            for i in range(m):
                chunk = cur[i * node_capacity : (i + 1) * node_capacity]
                nodes[i] = [
                    chunk[:, 0].min(),
                    chunk[:, 1].min(),
                    chunk[:, 2].max(),
                    chunk[:, 3].max(),
                ]
            self.levels.append(nodes)
            cur = nodes

    def query(self, qx0: float, qy0: float, qx1: float, qy1: float) -> np.ndarray:
        """Item indices whose bounds intersect the query box."""
        if qx0 != qx0 or not hasattr(self, "items"):  # NaN query or empty tree
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            cand = np.arange(len(self.items), dtype=np.int64)
        else:
            cand = np.array([0], dtype=np.int64)
            for level in range(len(self.levels) - 1, -1, -1):
                nodes = self.levels[level]
                n_children = len(self.levels[level - 1]) if level > 0 else len(self.items)
                hit = []
                for c in cand:
                    nb = nodes[c]
                    if nb[0] <= qx1 and qx0 <= nb[2] and nb[1] <= qy1 and qy0 <= nb[3]:
                        lo = c * self.cap
                        hit.append(np.arange(lo, min(lo + self.cap, n_children), dtype=np.int64))
                if not hit:
                    return np.empty(0, dtype=np.int64)
                cand = np.concatenate(hit)
        # cand indexes into leaf order; final exact bbox filter
        ib = self.item_bounds[self.items[cand]]
        mask = (ib[:, 0] <= qx1) & (qx0 <= ib[:, 2]) & (ib[:, 1] <= qy1) & (qy0 <= ib[:, 3])
        return self.items[cand[mask]]

    def query_batch(self, boxes: np.ndarray) -> list[np.ndarray]:
        return [self.query(*b) for b in np.asarray(boxes, dtype=np.float64).reshape(-1, 4)]
