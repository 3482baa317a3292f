"""Linear BVH over instance bounds — Karras 2012 radix-tree build.

Port of the reference's GPU LBVH (bvh_kernels.cu:320-453: 30-bit morton
codes from normalized centroids, longest-common-prefix radix tree,
bottom-up AABB refit).  Built host-side in numpy: the build is
once-per-scene (the reference's cudaEvent timings show milliseconds),
and the reference's *production* integrators never traverse the BVH —
only the octree (SURVEY.md §2.1: BVH used by visualize_BVH alone).  We
keep it for scene queries, instance culling and the debug visualizer.

Flattened output: index arrays instead of pointers (stackless-friendly).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class LBVH:
    # internal nodes: 0..n-2, leaves: n-1..2n-2 (leaf i = node n-1+i)
    left: np.ndarray        # (n-1,) int32 child node ids
    right: np.ndarray       # (n-1,) int32
    parent: np.ndarray      # (2n-1,) int32, -1 for root
    pmin: np.ndarray        # (2n-1, 3) f32 node bounds
    pmax: np.ndarray        # (2n-1, 3) f32
    order: np.ndarray       # (n,) morton-sorted instance indices

    @property
    def n_leaves(self) -> int:
        return len(self.order)


def morton30(centroids: np.ndarray) -> np.ndarray:
    """30-bit morton codes from [0,1]^3 points (bvh_kernels.cu:127-148)."""
    def expand(v):
        v = (v * 1024.0).clip(0, 1023).astype(np.uint32)
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v
    x = expand(centroids[:, 0])
    y = expand(centroids[:, 1])
    z = expand(centroids[:, 2])
    return (x << 2) | (y << 1) | z


def build_lbvh(pmin: np.ndarray, pmax: np.ndarray) -> LBVH:
    """Build from per-instance world AABBs (bvh_kernels.cu:460-580)."""
    n = len(pmin)
    scene_min = pmin.min(axis=0)
    scene_max = pmax.max(axis=0)
    extent = np.maximum(scene_max - scene_min, 1e-12)
    centroids = ((pmin + pmax) * 0.5 - scene_min) / extent
    codes = morton30(centroids.astype(np.float64))
    order = np.argsort(codes, kind="stable").astype(np.int32)
    codes = codes[order]
    # make codes unique by appending the index (Karras §4 footnote)
    keys = (codes.astype(np.uint64) << np.uint64(32)) | np.arange(
        n, dtype=np.uint64)

    if n == 1:
        return LBVH(left=np.zeros(0, np.int32), right=np.zeros(0, np.int32),
                    parent=np.array([-1], np.int32),
                    pmin=pmin[order].astype(np.float32),
                    pmax=pmax[order].astype(np.float32), order=order)

    def delta(i, j):
        if j < 0 or j >= n:
            return -1
        return 64 - int(keys[i] ^ keys[j]).bit_length() if keys[i] != keys[j] \
            else 64 + (n - abs(i - j))

    left = np.zeros(n - 1, np.int32)
    right = np.zeros(n - 1, np.int32)
    parent = np.full(2 * n - 1, -1, np.int32)

    for i in range(n - 1):
        # direction of the range (BuildRadixTree, bvh_kernels.cu:380-453)
        d = 1 if delta(i, i + 1) > delta(i, i - 1) else -1
        delta_min = delta(i, i - d)
        lmax = 2
        while delta(i, i + lmax * d) > delta_min:
            lmax *= 2
        length = 0
        t = lmax // 2
        while t >= 1:
            if delta(i, i + (length + t) * d) > delta_min:
                length += t
            t //= 2
        j = i + length * d
        delta_node = delta(i, j)
        s = 0
        t = (length + 1) // 2
        while True:
            if delta(i, i + (s + t) * d) > delta_node:
                s += t
            if t == 1:
                break
            t = (t + 1) // 2
        gamma = i + s * d + min(d, 0)
        lo = min(i, j)
        hi = max(i, j)
        lchild = (n - 1 + gamma) if lo == gamma else gamma
        rchild = (n - 1 + gamma + 1) if hi == gamma + 1 else gamma + 1
        left[i] = lchild
        right[i] = rchild
        parent[lchild] = i
        parent[rchild] = i

    # bottom-up refit (ConstructBVH, bvh_kernels.cu:341-378)
    node_pmin = np.zeros((2 * n - 1, 3), np.float32)
    node_pmax = np.zeros((2 * n - 1, 3), np.float32)
    node_pmin[n - 1:] = pmin[order]
    node_pmax[n - 1:] = pmax[order]
    done = np.zeros(n - 1, bool)
    stack = list(range(n - 1, 2 * n - 1))
    counts = np.zeros(n - 1, np.int8)
    for leaf in stack:
        node = parent[leaf]
        while node != -1:
            counts[node] += 1
            if counts[node] < 2:
                break
            node_pmin[node] = np.minimum(node_pmin[left[node]],
                                         node_pmin[right[node]])
            node_pmax[node] = np.maximum(node_pmax[left[node]],
                                         node_pmax[right[node]])
            done[node] = True
            node = parent[node]

    return LBVH(left=left, right=right, parent=parent,
                pmin=node_pmin, pmax=node_pmax, order=order)


def bvh_hit_count(bvh: LBVH, origin: np.ndarray, direction: np.ndarray
                  ) -> np.ndarray:
    """Host-side stack traversal counting leaf AABB hits per ray —
    the visualize_BVH debug integrator (render_kernel.cu:2108-2125)."""
    n = bvh.n_leaves
    out = np.zeros(len(origin), np.int32)
    inv = 1.0 / np.where(np.abs(direction) < 1e-12, 1e-12, direction)
    for ri in range(len(origin)):
        stack = [0 if n > 1 else n - 1]
        while stack:
            node = stack.pop()
            t1 = (bvh.pmin[node] - origin[ri]) * inv[ri]
            t2 = (bvh.pmax[node] - origin[ri]) * inv[ri]
            tmin = np.minimum(t1, t2).max()
            tmax = np.maximum(t1, t2).min()
            if tmax <= 0 or tmin > tmax:
                continue
            if node >= n - 1:
                out[ri] += 1
            else:
                stack.append(int(bvh.left[node]))
                stack.append(int(bvh.right[node]))
    return out
