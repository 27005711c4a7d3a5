"""Streaming hierarchical-sweep Pallas caster for big scenes (TPU-native).

Replaces the Embree two-level traversal for large meshes
(/root/reference/src/intersection.cpp:15-44) with shapes the TPU is
actually good at: gather-free dense sweeps driven by block-granular
culling. The SAH tree is cut into clusters of C triangles
(ops/intersect_binned.build_clusters); G consecutive clusters
(spatially local — adjacent subtrees in SAH preorder) form a
"supercluster".

Two kernels:

1. LIST-DRIVEN (default; table fits in VMEM — RESIDENT_BYTES):
   culling runs OUTSIDE the kernel in dense XLA:
     - exact per-lane slab tests against every supercluster AABB,
       any-reduced per ray block  ((N, S) -> (R, S) masks);
     - a conservative interval-arithmetic "ray bundle" test of each
       block against the member cluster AABBs ((R, K), nearly free);
     - the masks compact into per-block lists of packed
       (supercluster id << G | member bitmask) words, scalar-prefetched
       into SMEM.
   The kernel's only grid dimension is ray blocks; per block it
   fori-loops over exactly the listed superclusters and dense-tests the
   bitmask'd member clusters — ZERO vector reductions or `pl.when`
   gates on vector predicates inside the loop. Measured on matpreview:
   a NOOP kernel on the round-2 (ray blocks x clusters) grid cost
   6.6 ms of per-step machinery, and each in-kernel `jnp.any` gate
   ~2.8 us; this design pays neither.

2. STREAMING (fallback for tables too big for VMEM): grid is
   (ray blocks, superclusters); each step slab-gates and streams the
   supercluster's (G*C, 12) Woop block via BlockSpec DMA.

Front-to-back early-out is traded for cull rate: the caller sorts rays
by (direction octant, origin Morton code) so each block's rays are
spatially coherent and most (block, supercluster) pairs are culled.

Padding triangles have all-zero Woop rows -> dz == 0 -> guarded out;
padding clusters have inverted AABBs (lo=+inf, hi=-inf) -> slab tests
and bundle tests never pass.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float('inf')
BLOCK_R = 1024           # rays per resident block
GROUP = 8                # clusters per supercluster
RESIDENT_BYTES = 8 << 20  # Woop-table VMEM budget for the resident path


# ---------------------------------------------------------------------------
# Host packing (from ops/intersect_binned.build_clusters output)
# ---------------------------------------------------------------------------

def pack_sweep(cl, group=GROUP):
    """Repack cluster data for the sweep kernel. Returns dict with
    sw_A (K*C, 12) f32 rows [a0x a1x a2x bx | ...y | ...z] per triangle,
    sw_prim (K*C, 1) f32 global tri ids (-1 pad), sw_aabb (K, 8) f32
    [lo3 hi3 0 0] per cluster, sw_saabb (K/group, 8) supercluster AABBs.
    K is padded to a multiple of `group` (padding clusters carry
    inverted AABBs so their slab test never passes)."""
    cl_A, cl_b, cl_prim = cl['cl_A'], cl['cl_b'], cl['cl_prim']
    K0, _, threeC = cl_A.shape
    C = threeC // 3
    K = -(-K0 // group) * group
    A = np.zeros((K, 3, 3, C), np.float32)
    A[:K0] = cl_A.reshape(K0, 3, 3, C)
    b = np.zeros((K, 3, C), np.float32)
    b[:K0] = cl_b.reshape(K0, 3, C)
    sw = np.zeros((K, C, 12), np.float32)
    for axis in range(3):
        sw[:, :, 4 * axis:4 * axis + 3] = A[:, :, axis, :].transpose(
            0, 2, 1)
        sw[:, :, 4 * axis + 3] = b[:, axis, :]
    aabb = np.zeros((K, 8), np.float32)
    aabb[:, 0:3] = INF
    aabb[:, 3:6] = -INF
    aabb[:K0, 0:3] = cl['cl_lo']
    aabb[:K0, 3:6] = cl['cl_hi']
    S = K // group
    saabb = np.zeros((S, 8), np.float32)
    saabb[:, 0:3] = aabb[:, 0:3].reshape(S, group, 3).min(axis=1)
    saabb[:, 3:6] = aabb[:, 3:6].reshape(S, group, 3).max(axis=1)
    prim = np.full((K, C), -1.0, np.float32)
    prim[:K0] = cl_prim.astype(np.float32)
    assert cl_prim.max(initial=0) < (1 << 24), \
        "sweep prim ids stored as f32: exact only below 2^24"
    return dict(sw_A=sw.reshape(K * C, 12),
                sw_prim=prim.reshape(K * C, 1),
                sw_aabb=aabb, sw_saabb=saabb)


# ---------------------------------------------------------------------------
# XLA-side culling for the list-driven kernel
# ---------------------------------------------------------------------------

def _super_masks(scene, o, d, inv, tnear, tfar, R, B):
    """Exact per-lane slab test vs every supercluster AABB, any-reduced
    per ray block. (N,) rays -> (R, S) bool."""
    sab = scene.sw_saabb                                   # (S, 8)
    tmin = jnp.broadcast_to(tnear[:, None],
                            (o.shape[0], sab.shape[0]))
    tmax = jnp.broadcast_to(tfar[:, None], tmin.shape)
    for ax in range(3):
        ta = (sab[None, :, ax] - o[:, ax, None]) * inv[:, ax, None]
        tb = (sab[None, :, ax + 3] - o[:, ax, None]) * inv[:, ax, None]
        tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
        tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
    enter = tmin <= tmax                                   # (N, S)
    return enter.reshape(R, B, -1).any(axis=1)


def _bundle_member_masks(scene, o, inv, tnear, tfar, R, B):
    """Conservative interval-arithmetic slab test of each ray BLOCK
    against every member cluster AABB -> (R, K) bool. Each block is an
    interval box [o_lo, o_hi] x [inv_lo, inv_hi]; the test can only
    over-approximate the union of the block's per-lane tests."""
    ab = scene.sw_aabb                                     # (K, 8)
    o_lo = o.reshape(R, B, 3).min(axis=1)                  # (R, 3)
    o_hi = o.reshape(R, B, 3).max(axis=1)
    i_lo = inv.reshape(R, B, 3).min(axis=1)
    i_hi = inv.reshape(R, B, 3).max(axis=1)
    tn_lo = tnear.reshape(R, B).min(axis=1)                # (R,)
    tf_hi = tfar.reshape(R, B).max(axis=1)
    tmin_lb = jnp.broadcast_to(tn_lo[:, None], (R, ab.shape[0]))
    tmax_ub = jnp.broadcast_to(tf_hi[:, None], tmin_lb.shape)
    for ax in range(3):
        lo = ab[None, :, ax]                               # (1, K)
        hi = ab[None, :, ax + 3]
        bounds = []
        for corner in (lo - o_lo[:, ax, None], lo - o_hi[:, ax, None],
                       hi - o_lo[:, ax, None], hi - o_hi[:, ax, None]):
            bounds.append(corner * i_lo[:, ax, None])
            bounds.append(corner * i_hi[:, ax, None])
        ax_lb = functools.reduce(jnp.minimum, bounds)
        ax_ub = functools.reduce(jnp.maximum, bounds)
        tmin_lb = jnp.maximum(tmin_lb, ax_lb)
        tmax_ub = jnp.minimum(tmax_ub, ax_ub)
    return tmin_lb <= tmax_ub                              # (R, K)


def _build_lists(scene, o, d, inv, tnear, tfar, R, B, S, G):
    """Per-block compacted supercluster worklists.

    Returns (clist (R, S) i32, counts (R,) i32): clist[i, :counts[i]]
    holds packed words (supercluster id << G) | member-cluster bitmask,
    ascending by supercluster id (preserves the SAH preorder's rough
    front-to-back coherence within the block sort order)."""
    smask = _super_masks(scene, o, d, inv, tnear, tfar, R, B)  # (R, S)
    mmask = _bundle_member_masks(scene, o, inv, tnear, tfar, R, B)
    bits = (mmask.reshape(R, S, G).astype(jnp.int32) <<
            jnp.arange(G, dtype=jnp.int32)[None, None, :]).sum(axis=2)
    smask = smask & (bits != 0)
    sid = jnp.arange(S, dtype=jnp.int32)[None, :]
    word = jnp.where(smask, (sid << G) | bits, jnp.int32(2 ** 30))
    clist = jnp.sort(word, axis=1)
    counts = smask.sum(axis=1, dtype=jnp.int32)
    return clist, counts


# ---------------------------------------------------------------------------
# List-driven resident kernel
# ---------------------------------------------------------------------------

def _kernel_list(counts_ref, clist_ref, oT_ref, dT_ref, tn_ref, tf_ref,
                 A_ref, prim_ref, t_o, p_o, u_o, v_o, *, C: int, G: int,
                 any_hit: bool):
    i = pl.program_id(0)
    o = oT_ref[:]                          # (3, B)
    d = dT_ref[:]
    tnear = tn_ref[:]                      # (1, B)
    tfar = tf_ref[:]

    t_o[:] = jnp.full_like(t_o[:], INF)
    p_o[:] = jnp.full_like(p_o[:], -1.0)
    u_o[:] = jnp.zeros_like(u_o[:])
    v_o[:] = jnp.zeros_like(v_o[:])

    def body(it, _):
        word = clist_ref[i, it]
        sid = word >> G

        # inner fori (not an unrolled python loop): ONE body instance,
        # so the dense test's (C, B) temporaries are allocated once —
        # unrolling G bodies multiplied kernel stack VMEM ~G-fold
        def member(g, _):
            @pl.when(((word >> g) & 1) == 1)
            def _test():
                best = t_o[:]
                lim = jnp.minimum(best, tfar)
                row0 = (sid * G + g) * C
                A = A_ref[pl.dslice(row0, C), :]           # (C, 12)

                def contract(c0, vec, bias):
                    r = (A[:, c0:c0 + 1] * vec[0:1] +
                         A[:, c0 + 1:c0 + 2] * vec[1:2] +
                         A[:, c0 + 2:c0 + 3] * vec[2:3])
                    return r + A[:, c0 + 3:c0 + 4] if bias else r

                oz = contract(8, o, True)
                dz = contract(8, d, False)
                safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
                t = -oz / safe_dz
                ox = contract(0, o, True)
                dx = contract(0, d, False)
                u = ox + t * dx
                oy = contract(4, o, True)
                dy = contract(4, d, False)
                v = oy + t * dy
                hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
                       (u + v <= 1.0) & (t > tnear) & (t < lim))
                t = jnp.where(hit, t, INF)
                tbn = jnp.min(t, axis=0, keepdims=True)    # (1, B)
                better = tbn < best
                t_o[:] = jnp.where(better, tbn, best)
                if any_hit:
                    p_o[:] = jnp.where(better, 0.0, p_o[:])
                else:
                    sel = (t == tbn) & hit
                    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape,
                                                    0)
                    first = jnp.min(jnp.where(sel, iota, C), axis=0,
                                    keepdims=True)
                    self_f = (sel & (iota == first)).astype(jnp.float32)
                    prim = prim_ref[pl.dslice(row0, C), :]
                    pn = jnp.sum(self_f * prim, axis=0, keepdims=True)
                    un = jnp.sum(self_f * u, axis=0, keepdims=True)
                    vn = jnp.sum(self_f * v, axis=0, keepdims=True)
                    p_o[:] = jnp.where(better, pn, p_o[:])
                    u_o[:] = jnp.where(better, un, u_o[:])
                    v_o[:] = jnp.where(better, vn, v_o[:])
            return 0

        jax.lax.fori_loop(0, G, member, 0)
        return 0

    jax.lax.fori_loop(0, counts_ref[i], body, 0)


def _call_list(scene, o, d, tnear, tfar, any_hit):
    N = o.shape[0]
    K = scene.sw_aabb.shape[0]
    S = scene.sw_saabb.shape[0]
    G = K // S
    C = scene.sw_A.shape[0] // K
    pad = (-N) % BLOCK_R
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tnear = jnp.pad(tnear, (0, pad))
        tfar = jnp.pad(tfar, (0, pad), constant_values=-1.0)
    Np = N + pad
    R = Np // BLOCK_R
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    clist, counts = _build_lists(scene, o, d, inv, tnear, tfar, R,
                                 BLOCK_R, S, G)
    kern = functools.partial(_kernel_list, C=C, G=G, any_hit=any_hit)
    ray = lambda r: pl.BlockSpec((r, BLOCK_R), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM)
    whole = lambda a: pl.BlockSpec(a.shape, lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM)
    t, p, u, v = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(R,),
            in_specs=[
                ray(3), ray(3), ray(1), ray(1),
                whole(scene.sw_A), whole(scene.sw_prim),
            ],
            out_specs=[ray(1), ray(1), ray(1), ray(1)],
        ),
        out_shape=[jax.ShapeDtypeStruct((1, Np), jnp.float32)] * 4,
    )(counts, clist, o.T, d.T, tnear[None, :], tfar[None, :],
      scene.sw_A, scene.sw_prim)
    return (t[0, :N], p[0, :N].astype(jnp.int32), u[0, :N], v[0, :N])


# ---------------------------------------------------------------------------
# Streaming kernel (tables too big for VMEM)
# ---------------------------------------------------------------------------

def _kernel(oT_ref, dT_ref, invT_ref, tn_ref, tf_ref, saabb_ref, aabb_ref,
            A_ref, prim_ref, t_o, p_o, u_o, v_o, *, C: int, G: int,
            any_hit: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_o[:] = jnp.full_like(t_o[:], INF)
        p_o[:] = jnp.full_like(p_o[:], -1.0)
        u_o[:] = jnp.zeros_like(u_o[:])
        v_o[:] = jnp.zeros_like(v_o[:])

    o = oT_ref[:]                          # (3, B)
    d = dT_ref[:]
    inv = invT_ref[:]                      # precomputed 1/d (host side)
    tnear = tn_ref[:]                      # (1, B)
    tfar = tf_ref[:]

    def slab(ab, lim):
        """(1, 8) AABB row -> (1, B) enter mask against current lim."""
        tmin = tnear
        tmax = lim
        for ax in range(3):
            ta = (ab[0:1, ax:ax + 1] - o[ax:ax + 1]) * inv[ax:ax + 1]
            tb = (ab[0:1, ax + 3:ax + 4] - o[ax:ax + 1]) * inv[ax:ax + 1]
            tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
            tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
        return tmin <= tmax

    best0 = t_o[:]                         # (1, B)
    lim0 = jnp.minimum(best0, tfar)
    enter_s = slab(saabb_ref[pl.dslice(j, 1), :], lim0)
    if any_hit:
        enter_s = enter_s & (best0 == INF)

    @pl.when(jnp.any(enter_s))
    def _super():
        for g in range(G):
            # re-read the running best: earlier members of this
            # supercluster may have tightened it
            best = t_o[:]
            lim = jnp.minimum(best, tfar)
            enter = slab(aabb_ref[pl.dslice(j * G + g, 1), :], lim)
            if any_hit:
                enter = enter & (best == INF)

            @pl.when(jnp.any(enter))
            def _test(g=g, best=best, lim=lim):
                A = A_ref[g * C:(g + 1) * C, :]        # (C, 12) static

                def contract(c0, vec, bias):
                    r = (A[:, c0:c0 + 1] * vec[0:1] +
                         A[:, c0 + 1:c0 + 2] * vec[1:2] +
                         A[:, c0 + 2:c0 + 3] * vec[2:3])
                    return r + A[:, c0 + 3:c0 + 4] if bias else r

                oz = contract(8, o, True)
                dz = contract(8, d, False)
                safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
                t = -oz / safe_dz
                ox = contract(0, o, True)
                dx = contract(0, d, False)
                u = ox + t * dx
                oy = contract(4, o, True)
                dy = contract(4, d, False)
                v = oy + t * dy
                hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
                       (u + v <= 1.0) & (t > tnear) & (t < lim))
                t = jnp.where(hit, t, INF)
                tbn = jnp.min(t, axis=0, keepdims=True)     # (1, B)
                better = tbn < best
                t_o[:] = jnp.where(better, tbn, best)
                if any_hit:
                    p_o[:] = jnp.where(better, 0.0, p_o[:])
                else:
                    sel = (t == tbn) & hit
                    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                    first = jnp.min(jnp.where(sel, iota, C), axis=0,
                                    keepdims=True)
                    self_f = (sel & (iota == first)).astype(jnp.float32)
                    prim = prim_ref[g * C:(g + 1) * C, :]   # (C, 1)
                    pn = jnp.sum(self_f * prim, axis=0, keepdims=True)
                    un = jnp.sum(self_f * u, axis=0, keepdims=True)
                    vn = jnp.sum(self_f * v, axis=0, keepdims=True)
                    p_o[:] = jnp.where(better, pn, p_o[:])
                    u_o[:] = jnp.where(better, un, u_o[:])
                    v_o[:] = jnp.where(better, vn, v_o[:])


def _call_streaming(scene, o, d, tnear, tfar, any_hit):
    N = o.shape[0]
    K = scene.sw_aabb.shape[0]
    S = scene.sw_saabb.shape[0]
    G = K // S
    C = scene.sw_A.shape[0] // K
    pad = (-N) % BLOCK_R
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tnear = jnp.pad(tnear, (0, pad))
        tfar = jnp.pad(tfar, (0, pad), constant_values=-1.0)
    Np = N + pad
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    kern = functools.partial(_kernel, C=C, G=G, any_hit=any_hit)
    ray = lambda r: pl.BlockSpec((r, BLOCK_R), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM)
    t, p, u, v = pl.pallas_call(
        kern,
        grid=(Np // BLOCK_R, S),
        in_specs=[
            ray(3), ray(3), ray(3), ray(1), ray(1),
            pl.BlockSpec((S, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * C, 12), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * C, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[ray(1), ray(1), ray(1), ray(1)],
        out_shape=[jax.ShapeDtypeStruct((1, Np), jnp.float32)] * 4,
    )(o.T, d.T, inv.T, tnear[None, :], tfar[None, :],
      scene.sw_saabb, scene.sw_aabb, scene.sw_A, scene.sw_prim)
    return (t[0, :N], p[0, :N].astype(jnp.int32), u[0, :N], v[0, :N])


def _call(scene, o, d, tnear, tfar, any_hit):
    if scene.sw_A.size * 4 <= RESIDENT_BYTES:
        return _call_list(scene, o, d, tnear, tfar, any_hit)
    return _call_streaming(scene, o, d, tnear, tfar, any_hit)


# ---------------------------------------------------------------------------
# Ray sorting (cull-rate lever; see module docstring)
# ---------------------------------------------------------------------------

def _sort_keys(scene, o, d):
    """(direction octant << 29) | 10-bit-per-axis origin Morton code."""
    lo = scene.cl_lo.min(axis=0)
    hi = scene.cl_hi.max(axis=0)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)
    q = (q * 1023.0).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | \
        (spread(q[:, 2]) << 2)
    octant = ((d[:, 0] > 0).astype(jnp.uint32) |
              ((d[:, 1] > 0).astype(jnp.uint32) << 1) |
              ((d[:, 2] > 0).astype(jnp.uint32) << 2))
    return (octant << jnp.uint32(29)) | (morton >> jnp.uint32(3))


def _sorted_call(scene, o, d, tnear, tfar, any_hit):
    perm = jnp.argsort(_sort_keys(scene, o, d))
    out = _call(scene, o[perm], d[perm], tnear[perm], tfar[perm],
                any_hit)
    inv = jnp.argsort(perm)
    return tuple(x[inv] for x in out)


def intersect_sweep(scene, o, d, tnear, tfar):
    """Batched closest hit. Returns (t, prim, u, v) each (N,)."""
    return _sorted_call(scene, o, d, tnear, tfar, any_hit=False)


def occluded_sweep(scene, o, d, tnear, tfar):
    """Any-hit variant. Returns bool (N,)."""
    t, p, _, _ = _sorted_call(scene, o, d, tnear, tfar, any_hit=True)
    return p >= 0
