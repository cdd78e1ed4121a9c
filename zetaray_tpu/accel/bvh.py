"""Host-side BVH: binned-SAH build over triangles, cluster leaves.

Counterpart of the reference's acceleration structures: the CPU BVH
(Math/BVH.h:16-122, binned SAH with CastRay) and, in spirit, the DXR
BLAS/TLAS build (RtAccelerationStructure.h) -- except the TPU traversal
consumes *clusters*: leaves hold up to ``leaf_size`` triangles so the device
can intersect a whole leaf densely on the MXU.

The build runs once per scene (or per refit) on the host in NumPy. Output:

  - nodes: flat SoA arrays (aabb_lo/hi [M,3], left/right child ids,
    leaf first/count) in depth-first order;
  - a triangle permutation grouping each leaf's triangles contiguously
    (apply it to the scene arrays before upload so leaf c covers
    tris [first, first+count)).

Device use (two-level plan): a Pallas kernel tests ray *tiles* against
cluster AABBs and skips whole (tile x cluster) blocks with no overlap --
tile-level culling instead of per-ray stacks, the divergence-free TPU
answer to BVH traversal. ``cluster_aabbs`` exports what that kernel needs.
A reference CPU ``cast_ray`` is provided as the traversal oracle (mirrors
BVH::CastRay).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_N_BINS = 16


@dataclass
class BVH:
    # nodes, SoA; node 0 is the root
    lo: np.ndarray  # [M, 3]
    hi: np.ndarray  # [M, 3]
    left: np.ndarray  # [M] child id or -1 for leaves
    right: np.ndarray  # [M]
    first: np.ndarray  # [M] leaf: first triangle (post-permutation)
    count: np.ndarray  # [M] leaf: triangle count (0 for inner nodes)
    perm: np.ndarray  # [T] original triangle index per new slot

    @property
    def num_nodes(self) -> int:
        return int(self.lo.shape[0])

    def leaves(self):
        return np.nonzero(self.count > 0)[0]

    def cluster_aabbs(self):
        """(lo, hi, first, count) arrays for leaf clusters, build order."""
        ls = self.leaves()
        return self.lo[ls], self.hi[ls], self.first[ls], self.count[ls]


def build_bvh(v0, v1, v2, leaf_size: int = 64) -> BVH:
    """Binned-SAH top-down build. O(T log T) host time."""
    t = v0.shape[0]
    lo_t = np.minimum(np.minimum(v0, v1), v2)
    hi_t = np.maximum(np.maximum(v0, v1), v2)
    cent = (lo_t + hi_t) * 0.5

    order = np.arange(t)
    nodes_lo, nodes_hi = [], []
    nodes_left, nodes_right = [], []
    nodes_first, nodes_count = [], []
    out_perm = np.empty(t, np.int64)
    out_cursor = 0

    def new_node():
        nodes_lo.append(None)
        nodes_hi.append(None)
        nodes_left.append(-1)
        nodes_right.append(-1)
        nodes_first.append(0)
        nodes_count.append(0)
        return len(nodes_lo) - 1

    # iterative stack: (node_id, index array)
    root = new_node()
    stack = [(root, order)]
    while stack:
        nid, idx = stack.pop()
        nonlocal_lo = lo_t[idx].min(0)
        nonlocal_hi = hi_t[idx].max(0)
        nodes_lo[nid] = nonlocal_lo
        nodes_hi[nid] = nonlocal_hi
        n = idx.shape[0]
        if n <= leaf_size:
            nodes_first[nid] = out_cursor
            nodes_count[nid] = n
            out_perm[out_cursor : out_cursor + n] = idx
            out_cursor += n
            continue
        # binned SAH over the widest centroid axis
        c = cent[idx]
        c_lo = c.min(0)
        c_hi = c.max(0)
        axis = int(np.argmax(c_hi - c_lo))
        extent = c_hi[axis] - c_lo[axis]
        if extent < 1e-12:
            # degenerate spread: median split
            half = n // 2
            part = np.argsort(c[:, axis])
            l_idx, r_idx = idx[part[:half]], idx[part[half:]]
        else:
            bins = np.minimum(
                ((c[:, axis] - c_lo[axis]) / extent * _N_BINS).astype(np.int64),
                _N_BINS - 1,
            )
            # SAH cost per split position
            counts = np.bincount(bins, minlength=_N_BINS)
            bin_lo = np.full((_N_BINS, 3), np.inf)
            bin_hi = np.full((_N_BINS, 3), -np.inf)
            for b in range(_N_BINS):
                m = bins == b
                if m.any():
                    bin_lo[b] = lo_t[idx[m]].min(0)
                    bin_hi[b] = hi_t[idx[m]].max(0)

            def area(lo, hi):
                d = np.maximum(hi - lo, 0)
                return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

            # prefix/suffix sweeps
            lf_lo = np.minimum.accumulate(bin_lo, 0)
            lf_hi = np.maximum.accumulate(bin_hi, 0)
            rt_lo = np.minimum.accumulate(bin_lo[::-1], 0)[::-1]
            rt_hi = np.maximum.accumulate(bin_hi[::-1], 0)[::-1]
            n_l = np.cumsum(counts)[:-1]
            n_r = n - n_l
            cost = area(lf_lo[:-1], lf_hi[:-1]) * n_l + area(rt_lo[1:], rt_hi[1:]) * n_r
            cost = np.where((n_l == 0) | (n_r == 0), np.inf, cost)
            split = int(np.argmin(cost))
            go_left = bins <= split
            if not go_left.any() or go_left.all():
                half = n // 2
                part = np.argsort(c[:, axis])
                l_idx, r_idx = idx[part[:half]], idx[part[half:]]
            else:
                l_idx, r_idx = idx[go_left], idx[~go_left]
        lid = new_node()
        rid = new_node()
        nodes_left[nid] = lid
        nodes_right[nid] = rid
        stack.append((rid, r_idx))
        stack.append((lid, l_idx))

    return BVH(
        lo=np.asarray(nodes_lo, np.float32),
        hi=np.asarray(nodes_hi, np.float32),
        left=np.asarray(nodes_left, np.int32),
        right=np.asarray(nodes_right, np.int32),
        first=np.asarray(nodes_first, np.int32),
        count=np.asarray(nodes_count, np.int32),
        perm=out_perm,
    )


def _slab_test(lo, hi, o, inv_d, t_min, t_max):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    t_near = np.minimum(t0, t1).max(-1)
    t_far = np.maximum(t0, t1).min(-1)
    return (t_far >= np.maximum(t_near, t_min)) & (t_near <= t_max), t_near


def cast_ray(bvh: BVH, v0, v1, v2, o, d, t_min=1e-4, t_max=np.inf):
    """CPU closest-hit through the BVH (oracle; mirrors BVH::CastRay).

    v* must be the PERMUTED triangle arrays (v0_original[bvh.perm]).
    Returns (t, tri_slot) where tri_slot indexes the permuted arrays.
    """
    inv_d = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    best_t, best_tri = t_max, -1
    stack = [0]
    while stack:
        nid = stack.pop()
        ok, _ = _slab_test(bvh.lo[nid], bvh.hi[nid], o, inv_d, t_min, best_t)
        if not ok:
            continue
        if bvh.count[nid] > 0:
            f, c = bvh.first[nid], bvh.count[nid]
            for s in range(f, f + c):
                e1 = v1[s] - v0[s]
                e2 = v2[s] - v0[s]
                pvec = np.cross(d, e2)
                det = pvec @ e1
                if abs(det) < 1e-16:
                    continue
                inv = 1.0 / det
                tv = o - v0[s]
                u = (tv @ pvec) * inv
                qv = np.cross(tv, e1)
                v = (d @ qv) * inv
                th = (e2 @ qv) * inv
                if u >= 0 and v >= 0 and u + v <= 1 and t_min < th < best_t:
                    best_t, best_tri = th, s
        else:
            stack.append(int(bvh.left[nid]))
            stack.append(int(bvh.right[nid]))
    return best_t, best_tri
