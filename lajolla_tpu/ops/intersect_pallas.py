"""Pallas TPU kernel: fused brute-force ray-triangle intersection.

The Woop-transform formulation (see ops/intersect.py) is two K=3
contractions plus an elementwise resolve; done in plain XLA the (N, 3T)
intermediates round-trip through HBM (~1 GB per bounce at N=262k). This
kernel blocks the ray axis, keeps everything in VMEM, and writes only the
per-ray result — HBM traffic drops to the rays in + hits out.

Layout: rays live in the MINOR (lane) dimension — all per-triangle
intermediates are (T, B) with B=512 lanes, so every VPU op runs at full
width; the triangle axis maps to sublanes. The K=3 contraction is done
as three broadcasted FMAs (exact fp32, no MXU rounding).

Used for small scenes (T up to a few hundred; larger scenes take the BVH
path). The whole triangle set lives in VMEM per block.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float('inf')
BLOCK_B = 4096


def _kernel(o_ref, d_ref, tn_ref, tf_ref, Ax_ref, Ay_ref, Az_ref,
            qf_ref, t_ref, prim_ref, u_ref, v_ref, *, T: int,
            want_uv: bool):
    # o/d: (B, 3) transposed IN-KERNEL to (3, B); tn/tf: (1, B);
    # A{x,y,z}: (T, 4) rows [a0 a1 a2 bias]; qf: (T, 1) quad flags
    # (flagged cast prims accept the parallelogram max(u, v) <= 1;
    # scene/compile.py _merge_parallelograms — the host wrapper remaps
    # u + v > 1 hits to the partner triangle)
    o = o_ref[:].T
    d = d_ref[:].T
    tnear = tn_ref[:]         # (1, B)
    tfar = tf_ref[:]

    def contract(A, vec, with_bias):
        # (T,1)x(1,B) broadcasts: out (T, B)
        r = (A[:, 0:1] * vec[0:1, :] + A[:, 1:2] * vec[1:2, :] +
             A[:, 2:3] * vec[2:3, :])
        if with_bias:
            r = r + A[:, 3:4]
        return r

    Ax, Ay, Az = Ax_ref[:], Ay_ref[:], Az_ref[:]
    oz = contract(Az, o, True)
    dz = contract(Az, d, False)
    safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
    t = -oz / safe_dz
    ox = contract(Ax, o, True)
    dx = contract(Ax, d, False)
    u = ox + t * dx
    oy = contract(Ay, o, True)
    dy = contract(Ay, d, False)
    v = oy + t * dy
    # broadcast the f32 flag to full shape BEFORE comparing: Mosaic
    # rejects selects whose i1 condition is a (T, 1) broadcast
    # ("unsupported target bitwidth for truncation") — same fix as
    # integrators/path_kernel.py _hit_mask
    qfb = jnp.broadcast_to(qf_ref[:], u.shape)
    lim = jnp.where(qfb > 0.0, 1.0 - jnp.maximum(u, v),
                    1.0 - u - v)
    hit = ((jnp.abs(dz) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
           (lim >= 0.0) & (t > tnear) & (t < tfar))
    t = jnp.where(hit, t, INF)
    t_best = jnp.min(t, axis=0)                    # (B,)
    miss = t_best == INF
    t_ref[0, :] = jnp.where(miss, INF, t_best)
    if want_uv:
        iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        i = jnp.argmin(t, axis=0)
        sel = iota == i[None, :]
        prim_ref[0, :] = jnp.where(miss, -1, i).astype(jnp.int32)
        u_ref[0, :] = jnp.sum(jnp.where(sel, u, 0.0), axis=0)
        v_ref[0, :] = jnp.sum(jnp.where(sel, v, 0.0), axis=0)
    else:
        prim_ref[0, :] = jnp.where(miss, -1, 0).astype(jnp.int32)
        u_ref[0, :] = jnp.zeros_like(t_best)
        v_ref[0, :] = jnp.zeros_like(t_best)


def _call(scene, o, d, tnear, tfar, want_uv, occ_only=False):
    N = o.shape[0]
    pad = (-N) % BLOCK_B
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tnear = jnp.pad(tnear, (0, pad))
        tfar = jnp.pad(tfar, (0, pad))
    Np = N + pad
    tn2 = tnear[None, :]
    tf2 = tfar[None, :]
    # per-axis (T, 4) transform rows [a0 a1 a2 bias]. occ_only: the
    # occluder subset (convex-envelope tris can never block a shadow
    # segment — scene/compile.py) — prim ids then index the SUBSET and
    # are only valid as a hit/miss boolean.
    A = scene.tri_woop_A_occ if occ_only else scene.tri_woop_A
    b = scene.tri_woop_b_occ if occ_only else scene.tri_woop_b
    qf = scene.cast_occ_quad if occ_only else scene.cast_quad
    T = A.shape[1] // 3
    Ax = jnp.concatenate([A[:, :T].T, b[:T, None]], axis=1)
    Ay = jnp.concatenate([A[:, T:2 * T].T, b[T:2 * T, None]], axis=1)
    Az = jnp.concatenate([A[:, 2 * T:].T, b[2 * T:, None]], axis=1)

    grid = (Np // BLOCK_B,)
    kern = functools.partial(_kernel, T=T, want_uv=want_uv)
    full = lambda i: (0, 0)
    blk = lambda i: (0, i)
    t, prim, u, v = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_B, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_B), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_B), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.int32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ],
    )(o, d, tn2, tf2, Ax, Ay, Az, qf[:, None])
    return (t[0, :N], prim[0, :N], u[0, :N], v[0, :N])


def intersect_brute_pallas(scene, o, d, tnear, tfar):
    """o, d: (N,3); tnear/tfar: (N,). Returns (t, prim, u, v) each (N,)
    — prim in TRUE triangle ids (quad cast hits with u + v > 1 remap to
    the partner triangle, barycentrics included)."""
    t, ci, u, v = _call(scene, o, d, tnear, tfar, want_uv=True)
    c = jnp.maximum(ci, 0)
    back = (scene.cast_quad[c] > 0) & (u + v > 1.0)
    prim = jnp.where(back, scene.cast_alt[c], scene.cast_src[c])
    prim = jnp.where(ci < 0, -1, prim).astype(jnp.int32)
    ur = jnp.where(back, 1.0 - v, u)
    vr = jnp.where(back, u + v - 1.0, v)
    return t, prim, ur, vr


def occluded_brute_pallas(scene, o, d, tnear, tfar):
    """Any-hit variant: returns bool (N,)."""
    t, _, _, _ = _call(scene, o, d, tnear, tfar, want_uv=False,
                       occ_only=True)
    return t < INF
