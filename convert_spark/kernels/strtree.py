"""Packed STR (Sort-Tile-Recursive) R-tree over polygon bounding boxes.

The broadcast-side index for the point-in-polygon spatial join
(SURVEY.md §2.5): built once on the driver from the (small) polygon layer,
broadcast to executors, queried per Arrow batch to produce candidate
polygon ids that the exact ray-casting kernel (kernels.pip) then refines.

Pure numpy; the packed layout (level-ordered bbox arrays) pickles compactly
for Spark broadcast. STR packing is the classic Leutenegger et al. 1997
bulk-load: sort by x-center into vertical slices, sort each slice by
y-center, pack ``node_capacity`` children per node.
"""

from __future__ import annotations

import math

import numpy as np


class STRtree:
    def __init__(self, boxes: np.ndarray, node_capacity: int = 16):
        """``boxes``: (N, 4) float64 [minx, miny, maxx, maxy]."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = boxes.shape[0]
        self.cap = node_capacity
        if self.n == 0:
            self.levels = []
            self.item_order = np.empty(0, dtype=np.int64)
            return
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = math.ceil(self.n / node_capacity)
        n_slices = math.ceil(math.sqrt(n_leaves))
        order = np.argsort(cx, kind="stable")
        slice_size = n_slices * node_capacity
        final = np.empty(self.n, dtype=np.int64)
        for s in range(0, self.n, slice_size):
            sl = order[s : s + slice_size]
            final[s : s + sl.size] = sl[np.argsort(cy[sl], kind="stable")]
        self.item_order = final  # leaf-contiguous item permutation

        # level 0 = items in packed order; build parent bbox levels upward
        cur = boxes[final]
        self.levels: list[np.ndarray] = []
        while cur.shape[0] > 1:
            n_nodes = math.ceil(cur.shape[0] / node_capacity)
            nxt = np.empty((n_nodes, 4), dtype=np.float64)
            for i in range(n_nodes):
                chunk = cur[i * node_capacity : (i + 1) * node_capacity]
                nxt[i] = [chunk[:, 0].min(), chunk[:, 1].min(), chunk[:, 2].max(), chunk[:, 3].max()]
            self.levels.append(nxt)
            cur = nxt
        self.item_boxes = boxes[final]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch point query. Returns (point_idx, item_idx) candidate pairs
        where the point falls inside the item's bbox."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        return self.query_boxes(np.stack([px, py, px, py], axis=1))

    def query_boxes(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch box-intersection query -> (query_idx, item_idx) pairs."""
        qboxes = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        nq = qboxes.shape[0]
        if self.n == 0 or nq == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        # frontier: (query_idx, node_idx) at the top level, descending
        top = len(self.levels) - 1
        if top < 0:  # single item, no internal levels
            qi, ii = self._filter_items(np.arange(nq), np.zeros(nq, dtype=np.int64), qboxes)
            return qi, self.item_order[ii]
        n_top = self.levels[top].shape[0]
        qi = np.repeat(np.arange(nq), n_top)
        ni = np.tile(np.arange(n_top), nq)
        qi, ni = self._prune(qi, ni, self.levels[top], qboxes)
        for lvl in range(top - 1, -1, -1):
            qi, ni = self._expand(qi, ni, self.levels[lvl].shape[0])
            qi, ni = self._prune(qi, ni, self.levels[lvl], qboxes)
        qi, ii = self._expand(qi, ni, self.n)
        qi, ii = self._filter_items(qi, ii, qboxes)
        return qi, self.item_order[ii]

    def _expand(self, qi, ni, child_count):
        base = ni * self.cap
        k = np.arange(self.cap, dtype=np.int64)
        child = (base[:, None] + k[None, :]).ravel()
        qq = np.repeat(qi, self.cap)
        keep = child < child_count
        return qq[keep], child[keep]

    def _prune(self, qi, ni, node_boxes, qboxes):
        b = node_boxes[ni]
        q = qboxes[qi]
        hit = (q[:, 0] <= b[:, 2]) & (q[:, 2] >= b[:, 0]) & (q[:, 1] <= b[:, 3]) & (q[:, 3] >= b[:, 1])
        return qi[hit], ni[hit]

    def _filter_items(self, qi, ii, qboxes):
        b = self.item_boxes[ii]
        q = qboxes[qi]
        hit = (q[:, 0] <= b[:, 2]) & (q[:, 2] >= b[:, 0]) & (q[:, 1] <= b[:, 3]) & (q[:, 3] >= b[:, 1])
        return qi[hit], ii[hit]
