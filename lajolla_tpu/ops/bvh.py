"""BVH: host-side builder (numpy) + device-side threaded traversal (JAX).

This is the TPU-native replacement for Embree (src/intersection.cpp:32,83;
BVH built at rtcCommitScene, scene.cpp:20-27). Design:

* Build (host, parse time — build speed is a non-goal, like the
  reference's RTC_BUILD_QUALITY_HIGH): Morton-sort primitive centroids,
  then a balanced median-split tree over the sorted order (LBVH-style
  topology), AABBs computed level-by-level with vectorized numpy. An
  optional C++ binned-SAH builder (csrc/) can replace the topology later;
  the array layout is shared.

* Layout (device): *threaded* (stackless) preorder. Each node stores
  lo/hi AABB, `first` (preorder child index for inner nodes, prim offset
  for leaves), `count` (0 = inner), and `skip` = preorder index of the
  node after its subtree. Traversal is then a single `while node < N`
  loop: advance to `first` on AABB hit (inner) or to `skip` otherwise —
  no per-lane stack, which is exactly what a lockstep vector machine
  wants. Early-out ordering loss vs. a near-child-first stack traversal
  is mitigated by the shrinking t_max in the AABB test.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lajolla_tpu.ops.intersect import ray_triangle, INF

LEAF_SIZE = 4


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------

def _morton3(x, y, z):
    """Interleave 10-bit x,y,z → 30-bit Morton code (vectorized)."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v
    return spread(x) | (spread(y) << np.uint64(1)) | (spread(z) << np.uint64(2))


def build_bvh(tri_lo, tri_hi, leaf_size=LEAF_SIZE):
    """Returns dict of numpy arrays: lo (N,3), hi (N,3), first (N,),
    count (N,), skip (N,), prim (T,) — the preorder threaded layout."""
    T = tri_lo.shape[0]
    if T == 0:
        return dict(lo=np.zeros((1, 3), np.float32),
                    hi=np.zeros((1, 3), np.float32),
                    first=np.zeros(1, np.int32), count=np.zeros(1, np.int32),
                    skip=np.ones(1, np.int32), prim=np.zeros(0, np.int32),
                    n_nodes=1)

    centers = 0.5 * (tri_lo + tri_hi)
    cmin, cmax = centers.min(0), centers.max(0)
    ext = np.maximum(cmax - cmin, 1e-12)
    q = np.clip(((centers - cmin) / ext) * 1023.0, 0, 1023).astype(np.uint32)
    codes = _morton3(q[:, 0], q[:, 1], q[:, 2])
    order = np.argsort(codes, kind='stable').astype(np.int32)
    lo_s, hi_s = tri_lo[order], tri_hi[order]

    # --- topology: median split over sorted order, BFS ---------------------
    starts = [0]
    ends = [T]
    left = [-1]
    levels = [[0]]
    while True:
        cur = levels[-1]
        nxt = []
        for n in cur:
            if ends[n] - starts[n] > leaf_size:
                mid = (starts[n] + ends[n]) // 2
                l = len(starts)
                left[n] = l
                starts += [starts[n], mid]
                ends += [mid, ends[n]]
                left += [-1, -1]
                nxt += [l, l + 1]
        if not nxt:
            break
        levels.append(nxt)

    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    left = np.asarray(left, np.int64)
    N = len(starts)
    is_leaf = left < 0

    # --- AABBs --------------------------------------------------------------
    # The full set of leaves tiles [0, T) in sorted order, so one global
    # reduceat computes every leaf AABB; inner nodes then union their
    # children level-by-level bottom-up.
    lo_n = np.empty((N, 3), np.float64)
    hi_n = np.empty((N, 3), np.float64)
    leaf_ids = np.nonzero(is_leaf)[0]
    srt = leaf_ids[np.argsort(starts[leaf_ids])]
    lo_n[srt] = np.minimum.reduceat(lo_s, starts[srt])
    hi_n[srt] = np.maximum.reduceat(hi_s, starts[srt])
    for lvl in levels[::-1]:
        lvl = np.asarray(lvl)
        inner_ids = lvl[~is_leaf[lvl]]
        if inner_ids.size:
            l = left[inner_ids]
            lo_n[inner_ids] = np.minimum(lo_n[l], lo_n[l + 1])
            hi_n[inner_ids] = np.maximum(hi_n[l], hi_n[l + 1])

    # --- preorder threading --------------------------------------------------
    size = np.ones(N, np.int64)
    for lvl in levels[::-1]:
        lvl = np.asarray(lvl)
        inner_ids = lvl[~is_leaf[lvl]]
        if inner_ids.size:
            l = left[inner_ids]
            size[inner_ids] = 1 + size[l] + size[l + 1]
    pre = np.zeros(N, np.int64)
    for lvl in levels:
        lvl = np.asarray(lvl)
        inner_ids = lvl[~is_leaf[lvl]]
        if inner_ids.size:
            l = left[inner_ids]
            pre[l] = pre[inner_ids] + 1
            pre[l + 1] = pre[inner_ids] + 1 + size[l]

    out_lo = np.empty((N, 3), np.float32)
    out_hi = np.empty((N, 3), np.float32)
    out_first = np.empty(N, np.int32)
    out_count = np.empty(N, np.int32)
    out_skip = np.empty(N, np.int32)
    out_lo[pre] = lo_n.astype(np.float32)
    out_hi[pre] = hi_n.astype(np.float32)
    out_first[pre] = np.where(is_leaf, starts, pre[np.maximum(left, 0)]).astype(np.int32)
    out_count[pre] = np.where(is_leaf, ends - starts, 0).astype(np.int32)
    out_skip[pre] = (pre + size).astype(np.int32)

    return dict(lo=out_lo, hi=out_hi, first=out_first, count=out_count,
                skip=out_skip, prim=order, n_nodes=N)


# ---------------------------------------------------------------------------
# Device traversal (per-ray; callers vmap)
# ---------------------------------------------------------------------------

def _safe_inv(d):
    tiny = 1e-12
    return jnp.where(jnp.abs(d) > tiny, 1.0 / jnp.where(jnp.abs(d) > tiny, d, 1.0),
                     jnp.where(d >= 0, 1e12, -1e12))


def bvh_traverse(scene, o, d, tnear, tfar):
    """Closest-hit traversal. Returns (t, prim_id, u, v); prim_id=-1 miss."""
    n_nodes = scene.bvh_lo.shape[0]
    inv_d = _safe_inv(d)

    def cond(st):
        return st[0] < n_nodes

    def body(st):
        node, t_best, best_prim, best_u, best_v = st
        lo = scene.bvh_lo[node]
        hi = scene.bvh_hi[node]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1)), tnear)
        tmax = jnp.minimum(jnp.min(jnp.maximum(t0, t1)), t_best)
        hit_box = tmin <= tmax
        first = scene.bvh_first[node]
        count = scene.bvh_count[node]
        is_leaf = count > 0
        test = hit_box & is_leaf
        for k in range(LEAF_SIZE):
            slot = jnp.minimum(first + k, scene.bvh_prim.shape[0] - 1)
            idx = scene.bvh_prim[slot]
            t, u, v, h = ray_triangle(o, d, scene.tri_p0[idx],
                                      scene.tri_e1[idx], scene.tri_e2[idx],
                                      tnear, t_best)
            h = h & test & (k < count)
            t_best = jnp.where(h, t, t_best)
            best_prim = jnp.where(h, idx, best_prim)
            best_u = jnp.where(h, u, best_u)
            best_v = jnp.where(h, v, best_v)
        nxt = jnp.where(hit_box & ~is_leaf, first, scene.bvh_skip[node])
        return (nxt, t_best, best_prim, best_u, best_v)

    init = (jnp.int32(0), jnp.minimum(tfar, INF), jnp.int32(-1),
            jnp.float32(0), jnp.float32(0))
    _, t_best, prim, u, v = jax.lax.while_loop(cond, body, init)
    miss = prim < 0
    return jnp.where(miss, INF, t_best), prim, u, v


def bvh_occluded(scene, o, d, tnear, tfar):
    """Any-hit traversal with early exit. Returns bool."""
    n_nodes = scene.bvh_lo.shape[0]
    inv_d = _safe_inv(d)

    def cond(st):
        node, found = st
        return (node < n_nodes) & ~found

    def body(st):
        node, found = st
        lo = scene.bvh_lo[node]
        hi = scene.bvh_hi[node]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1)), tnear)
        tmax = jnp.minimum(jnp.min(jnp.maximum(t0, t1)), tfar)
        hit_box = tmin <= tmax
        first = scene.bvh_first[node]
        count = scene.bvh_count[node]
        is_leaf = count > 0
        test = hit_box & is_leaf
        for k in range(LEAF_SIZE):
            slot = jnp.minimum(first + k, scene.bvh_prim.shape[0] - 1)
            idx = scene.bvh_prim[slot]
            _, _, _, h = ray_triangle(o, d, scene.tri_p0[idx],
                                      scene.tri_e1[idx], scene.tri_e2[idx],
                                      tnear, tfar)
            found = found | (h & test & (k < count))
        nxt = jnp.where(hit_box & ~is_leaf, first, scene.bvh_skip[node])
        return (nxt, found)

    _, found = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))
    return found
