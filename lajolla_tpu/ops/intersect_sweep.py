"""Streaming cluster-sweep Pallas caster for big scenes (TPU-native).

Replaces the Embree two-level traversal for large meshes
(/root/reference/src/intersection.cpp:15-44) with a shape the TPU is
actually good at: a dense sweep. The SAH tree is cut into clusters of C
triangles (ops/intersect_binned.build_clusters); the kernel grid is
(ray_blocks, clusters) and each step

  1. slab-tests the resident ray block against cluster j's AABB —
     ~20 cheap (1, B) VPU ops;
  2. only if ANY lane can still be improved by this cluster
     (`pl.when`), streams the cluster's (C, 12) Woop block from HBM and
     runs the dense (C, B) triangle test, folding the result into the
     running closest-hit kept in VMEM.

Rays stay resident in VMEM for the whole sweep (the output block's
index map ignores j, so Pallas treats j as a reduction dimension);
per-cluster blocks are contiguous slabs streamed sequentially — no
gathers anywhere, HBM traffic is `clusters x 48C bytes` per ray block
instead of the ordered-rounds engine's 9 KB-per-ray-per-round gather
storm (ops/intersect_binned.py _round).

Front-to-back early-out is traded for cull rate: the caller sorts rays
by (direction octant, origin Morton code) so each block's rays are
spatially coherent and most (block, cluster) pairs fail the slab test.

Padding triangles have all-zero Woop rows -> dz == 0 -> guarded out; no
prim-validity mask is needed in the hot test.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float('inf')
BLOCK_R = 2048           # rays per resident block


# ---------------------------------------------------------------------------
# Host packing (from ops/intersect_binned.build_clusters output)
# ---------------------------------------------------------------------------

def pack_sweep(cl):
    """Repack cluster data for the sweep kernel. Returns dict with
    sw_A (K*C, 12) f32 rows [a0x a1x a2x bx | ...y | ...z] per triangle,
    sw_prim (K*C, 1) f32 global tri ids (-1 pad), sw_aabb (K, 8) f32
    [lo3 hi3 0 0]."""
    cl_A, cl_b, cl_prim = cl['cl_A'], cl['cl_b'], cl['cl_prim']
    K, _, threeC = cl_A.shape
    C = threeC // 3
    A = cl_A.reshape(K, 3, 3, C)          # [k, i, axis, c]
    b = cl_b.reshape(K, 3, C)             # [k, axis, c]
    sw = np.zeros((K, C, 12), np.float32)
    for axis in range(3):
        sw[:, :, 4 * axis:4 * axis + 3] = A[:, :, axis, :].transpose(
            0, 2, 1)
        sw[:, :, 4 * axis + 3] = b[:, axis, :]
    aabb = np.zeros((K, 8), np.float32)
    aabb[:, 0:3] = cl['cl_lo']
    aabb[:, 3:6] = cl['cl_hi']
    assert cl_prim.max(initial=0) < (1 << 24), \
        "sweep prim ids stored as f32: exact only below 2^24"
    return dict(sw_A=sw.reshape(K * C, 12),
                sw_prim=cl_prim.astype(np.float32).reshape(K * C, 1),
                sw_aabb=aabb)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(oT_ref, dT_ref, tn_ref, tf_ref, aabb_ref, A_ref, prim_ref,
            t_o, p_o, u_o, v_o, *, C: int, any_hit: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_o[:] = jnp.full_like(t_o[:], INF)
        p_o[:] = jnp.full_like(p_o[:], -1.0)
        u_o[:] = jnp.zeros_like(u_o[:])
        v_o[:] = jnp.zeros_like(v_o[:])

    o = oT_ref[:]                          # (3, B)
    d = dT_ref[:]
    tnear = tn_ref[:]                      # (1, B)
    tfar = tf_ref[:]
    best = t_o[:]                          # (1, B)
    lim = jnp.minimum(best, tfar)

    # whole (K, 8) table resident in VMEM; dynamic row for cluster j
    ab = aabb_ref[pl.dslice(j, 1), :]                      # (1, 8)
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    tmin = tnear
    tmax = lim
    for ax in range(3):
        lo = ab[0:1, ax:ax + 1]
        hi = ab[0:1, ax + 3:ax + 4]
        ta = (lo - o[ax:ax + 1]) * inv[ax:ax + 1]
        tb = (hi - o[ax:ax + 1]) * inv[ax:ax + 1]
        tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
        tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
    enter = tmin <= tmax
    if any_hit:
        enter = enter & (best == INF)      # already-found lanes are done

    @pl.when(jnp.any(enter))
    def _test():
        A = A_ref[:]                       # (C, 12)

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
            prim = prim_ref[:]                      # (C, 1)
            pn = jnp.sum(self_f * prim, axis=0, keepdims=True)
            un = jnp.sum(self_f * u, axis=0, keepdims=True)
            vn = jnp.sum(self_f * v, axis=0, keepdims=True)
            p_o[:] = jnp.where(better, pn, p_o[:])
            u_o[:] = jnp.where(better, un, u_o[:])
            v_o[:] = jnp.where(better, vn, v_o[:])


def _call(scene, o, d, tnear, tfar, any_hit):
    N = o.shape[0]
    K = scene.sw_aabb.shape[0]
    C = scene.sw_A.shape[0] // K
    pad = (-N) % BLOCK_R
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tnear = jnp.pad(tnear, (0, pad))
        tfar = jnp.pad(tfar, (0, pad), constant_values=-1.0)
    Np = N + pad
    kern = functools.partial(_kernel, C=C, any_hit=any_hit)
    ray = lambda r: pl.BlockSpec((r, BLOCK_R), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM)
    t, p, u, v = pl.pallas_call(
        kern,
        grid=(Np // BLOCK_R, K),
        in_specs=[
            ray(3), ray(3), ray(1), ray(1),
            pl.BlockSpec((K, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 12), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[ray(1), ray(1), ray(1), ray(1)],
        out_shape=[jax.ShapeDtypeStruct((1, Np), jnp.float32)] * 4,
    )(o.T, d.T, tnear[None, :], tfar[None, :],
      scene.sw_aabb, scene.sw_A, scene.sw_prim)
    return (t[0, :N], p[0, :N].astype(jnp.int32), u[0, :N], v[0, :N])


# ---------------------------------------------------------------------------
# Ray sorting (cull-rate lever; see module docstring)
# ---------------------------------------------------------------------------

def _sort_keys(scene, o, d):
    """(direction octant << 30) | 10-bit-per-axis origin Morton code."""
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
