"""Fused Pallas path-advance megakernel (diffuse fast path).

One kernel advances a block of lanes by one full path vertex: closest-hit
intersection (Woop brute force), shading-normal reconstruction,
emissive-hit MIS, next-event estimation with an inlined shadow cast,
Lambertian cosine sampling and Russian roulette — entirely in VMEM, in
the (row, lane) layout. This removes every HBM round-trip and XLA op
boundary inside the hot wavefront iteration; the general engine
(integrators/path.py) keeps the per-op path for every other
configuration.

Activation (static, on SceneMeta): Lambertian-only materials, mesh-only
geometry and lights, no envmap, no media, constant textures, brute-force
intersector — the headline cbox workload qualifies. The per-item
counter-based uniforms are generated OUTSIDE and fed in; both this
driver and the general engine draw the same pcg-hash counter stream
(integrators/path.py), though images still differ in fp detail (this
kernel intersects via Woop transforms, the general engine via
Möller-Trumbore, so paths diverge chaotically) — agreement is
statistical, verified by the shared golden pins.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float('inf')
BLOCK = 4096
PI = 3.141592653589793


def supports(meta):
    from lajolla_tpu.scene.types import MAT_LAMBERTIAN
    return (meta.mat_types_present == (MAT_LAMBERTIAN,) and
            not meta.has_envmap and
            meta.num_spheres == 0 and
            meta.num_media == 0 and
            not meta.needs_uv and
            not meta.use_bvh and
            meta.num_triangles >= 1 and
            meta.num_lights >= 1)


# ---------------------------------------------------------------------------
# Host-side table packing (called from the scene compiler)
# ---------------------------------------------------------------------------

def pack_fast_path(p0, e1, e2, normals, indices, has_n_per_tri,
                   tri_light_id, tri_refl, tri_intensity, tri_inv_area,
                   tri_light_pmf, light_cdf, light_pmf, light_intensity,
                   light_inv_area, light_shape):
    """Build fp_tri (28, T), fp_light (8, L) numpy tables."""
    import numpy as np
    T = p0.shape[0]
    fp_tri = np.zeros((28, max(T, 1)), np.float32)
    if T:
        n0 = normals[indices[:, 0]]
        n1 = normals[indices[:, 1]]
        n2 = normals[indices[:, 2]]
        fp_tri[0:3] = p0.T
        fp_tri[3:6] = e1.T
        fp_tri[6:9] = e2.T
        fp_tri[9:12] = n0.T
        fp_tri[12:15] = n1.T
        fp_tri[15:18] = n2.T
        fp_tri[18] = has_n_per_tri
        fp_tri[19] = tri_light_id
        fp_tri[20:23] = tri_refl.T
        fp_tri[23:26] = tri_intensity.T
        fp_tri[26] = tri_inv_area
        fp_tri[27] = tri_light_pmf
    L = len(light_cdf)
    fp_light = np.zeros((8, max(L, 1)), np.float32)
    if L:
        fp_light[0] = light_cdf
        fp_light[1] = light_pmf
        fp_light[2:5] = light_intensity.T
        fp_light[5] = light_inv_area
        fp_light[6] = light_shape
    return fp_tri, fp_light


# ---------------------------------------------------------------------------
# Kernel helpers ((row, B) layout)
# ---------------------------------------------------------------------------

def _woop_mat(woop):
    """(T, 12) [Ax Ay Az] table -> (3T, 4) matmul operand [Az; Ax; Ay]."""
    return jnp.concatenate([woop[:, 8:12], woop[:, 0:4], woop[:, 4:8]],
                           axis=0)


USE_MXU_WOOP = False  # measured slower: K=4 matmul at HIGHEST precision


def _woop_tuv(o, d, W, T):
    """All-triangle Woop transform. o, d: (3,B); W: (3T,4) packed
    [Az; Ax; Ay]. Returns (t, u, v, valid_dz) each (T, B).

    Two strategies, both measured on v5e: the (3T,4)x(4,B) MXU matmul
    (K=4 at HIGHEST precision — 15 Mpaths/s on cbox) and the plain VPU
    contract chain (22 Mpaths/s); K is too small to feed the systolic
    array, so the VPU wins."""
    if USE_MXU_WOOP:
        B = o.shape[1]
        one = jnp.ones((1, B), jnp.float32)
        P = jax.lax.dot_general(W, jnp.concatenate([o, one], axis=0),
                                (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        D = jax.lax.dot_general(W[:, 0:3], d, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        oz, ox, oy = P[0:T], P[T:2 * T], P[2 * T:3 * T]
        dz, dx, dy = D[0:T], D[T:2 * T], D[2 * T:3 * T]
    else:
        def contract(A, vec, with_bias):
            r = (A[:, 0:1] * vec[0:1, :] + A[:, 1:2] * vec[1:2, :] +
                 A[:, 2:3] * vec[2:3, :])
            if with_bias:
                r = r + A[:, 3:4]
            return r
        Az, Ax, Ay = W[0:T], W[T:2 * T], W[2 * T:3 * T]
        oz = contract(Az, o, True)
        dz = contract(Az, d, False)
        ox = contract(Ax, o, True)
        dx = contract(Ax, d, False)
        oy = contract(Ay, o, True)
        dy = contract(Ay, d, False)
    # No dz==0 guard needed: t becomes ±inf/NaN and every hit test below
    # compares false on NaN, so degenerate rows simply never hit.
    t = -oz / dz
    u = ox + t * dx
    v = oy + t * dy
    return t, u, v


def _hit_mask(t, u, v, tnear, tfar):
    m = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
    hit = (m >= 0.0) & (t > tnear)
    if tfar is not None:
        hit = hit & (t < tfar)
    return hit


def _intersect(o, d, tnear, tfar, W, T):
    """Woop brute force. o,d: (3,B); tnear/tfar: (1,B)/scalar/None(=inf).
    Returns (t_best (1,B), sel (T,B) one-hot, u (1,B), v (1,B))."""
    t, u, v = _woop_tuv(o, d, W, T)
    hit = _hit_mask(t, u, v, tnear, tfar)
    t = jnp.where(hit, t, INF)
    t_best = jnp.min(t, axis=0, keepdims=True)
    sel = (t == t_best) & hit
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    first = jnp.min(jnp.where(sel, iota, T), axis=0, keepdims=True)
    sel = sel & (iota == first)
    ub = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
    vb = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
    return t_best, sel, ub, vb


def _occluded(o, d, tnear, tfar, W, T):
    """Any-hit shadow cast: no closest-hit reduction, no one-hot select.
    Returns occ (1, B) bool."""
    t, u, v = _woop_tuv(o, d, W, T)
    hit = _hit_mask(t, u, v, tnear, tfar)
    return jnp.max(hit.astype(jnp.float32), axis=0, keepdims=True) > 0.0


def _rows(sel_f32, table):
    """(C, T) table x (T, B) one-hot → (C, B), exact."""
    return jax.lax.dot_general(
        table, sel_f32, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def _norm3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _onb(nx, ny, nz):
    """Branch-free Frisvad ONB (core/math.py coordinate_system)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tx = 1.0 + sign * nx * nx * a
    ty = sign * b
    tz = -sign * nx
    bx = b
    by = sign + ny * ny * a
    bz = -ny
    return tx, ty, tz, bx, by, bz


def _advance_core(o, d, thr, rad, nv, dir_pdf, prev, un, act_in,
                  W, tri, light, stair,
                  *, T: int, L: int, eps_isect: float, eps_shadow: float,
                  max_depth: int, rr_depth: int, max_cap: int):
    """One path-vertex advance on plain (row, B) arrays; shared by the
    per-bounce kernel below and the fully-fused persistent megakernel
    (path_megakernel.py). W is the host-packed (3T, 4) Woop matrix
    (_woop_mat — Mosaic cannot re-concatenate it in-kernel). Returns
    (org', dir', thr', rad', dir_pdf', prev', alive)."""

    # ---- closest hit -------------------------------------------------------
    t_best, sel, ub, vb = _intersect(o, d, eps_isect, None, W, T)
    valid = (t_best < INF) & act_in                       # (1, B)
    self_f = sel.astype(jnp.float32)
    rows = _rows(self_f, tri)                             # (28, B)

    px = o[0:1] + t_best * d[0:1]
    py = o[1:2] + t_best * d[1:2]
    pz = o[2:3] + t_best * d[2:3]

    ngx = rows[4:5] * rows[8:9] - rows[5:6] * rows[7:8]   # e1 x e2
    ngy = rows[5:6] * rows[6:7] - rows[3:4] * rows[8:9]
    ngz = rows[3:4] * rows[7:8] - rows[4:5] * rows[6:7]
    ngx, ngy, ngz = _norm3(ngx, ngy, ngz)
    wb = 1.0 - ub - vb
    snx = wb * rows[9:10] + ub * rows[12:13] + vb * rows[15:16]
    sny = wb * rows[10:11] + ub * rows[13:14] + vb * rows[16:17]
    snz = wb * rows[11:12] + ub * rows[14:15] + vb * rows[17:18]
    has_n = rows[18:19] > 0
    snx = jnp.where(has_n, snx, ngx)
    sny = jnp.where(has_n, sny, ngy)
    snz = jnp.where(has_n, snz, ngz)
    snx, sny, snz = _norm3(snx, sny, snz)
    flip_g = _dot3(ngx, ngy, ngz, snx, sny, snz) < 0
    ngx = jnp.where(flip_g, -ngx, ngx)
    ngy = jnp.where(flip_g, -ngy, ngy)
    ngz = jnp.where(flip_g, -ngz, ngz)

    wix, wiy, wiz = -d[0:1], -d[1:2], -d[2:3]             # dir_view

    # ---- emissive hit + MIS (cached-pdf form) ------------------------------
    tli = rows[19:20]                                     # light id or -1
    hit_light = valid & (tli >= 0)
    le_r, le_g, le_b = rows[23:24], rows[24:25], rows[25:26]
    one_sided = _dot3(ngx, ngy, ngz, wix, wiy, wiz) > 0
    le_r = jnp.where(one_sided, le_r, 0.0)
    le_g = jnp.where(one_sided, le_g, 0.0)
    le_b = jnp.where(one_sided, le_b, 0.0)
    dpx = px - prev[0:1]
    dpy = py - prev[1:2]
    dpz = pz - prev[2:3]
    dist2p = jnp.maximum(dpx * dpx + dpy * dpy + dpz * dpz, 1e-20)
    G2 = jnp.abs(_dot3(d[0:1], d[1:2], d[2:3], ngx, ngy, ngz)) / dist2p
    p2e = dir_pdf * G2
    p1e = rows[27:28] * rows[26:27]                       # pmf * 1/area
    w2 = (p2e * p2e) / jnp.maximum(p1e * p1e + p2e * p2e, 1e-30)
    from_cam = nv <= 2.0
    w2 = jnp.where(from_cam, 1.0, w2)
    add = hit_light.astype(jnp.float32) * w2
    rad0 = rad[0:1] + thr[0:1] * le_r * add
    rad1 = rad[1:2] + thr[1:2] * le_g * add
    rad2 = rad[2:3] + thr[2:3] * le_b * add

    depth_stop = (nv > max_depth) if max_depth != -1 else (
        nv >= 2.0 + max_cap)
    alive = valid & ~depth_stop

    # ---- NEE ---------------------------------------------------------------
    # pick light by cdf (u[2]): idx = sum(cdf < u), computed in (L, B)
    lcdf_col = light[0:1, :].T                            # (L, 1)
    lsel_idx = jnp.sum((lcdf_col < un[2:3]).astype(jnp.float32),
                       axis=0, keepdims=True)             # (1, B)
    lsel_idx = jnp.minimum(lsel_idx, float(L - 1)).astype(jnp.int32)
    liota = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    lsel = (liota == lsel_idx).astype(jnp.float32)        # (L, B)
    lrow = _rows(lsel, light)                             # (8, B)
    l_pmf = lrow[1:2]
    l_int_r, l_int_g, l_int_b = lrow[2:3], lrow[3:4], lrow[4:5]
    l_inv_area = lrow[5:6]
    l_shape = lrow[6:7]
    # pick triangle within the light's shape: stair = shape_id + cdf
    key = l_shape + un[3:4]
    tsel_idx = jnp.sum((stair.T < key).astype(jnp.float32), axis=0,
                      keepdims=True)
    tsel_idx = jnp.minimum(tsel_idx, float(T - 1)).astype(jnp.int32)
    tiota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    tsel = (tiota == tsel_idx).astype(jnp.float32)        # (T, B)
    lt = _rows(tsel, tri)                                 # (28, B)
    a_s = jnp.sqrt(jnp.clip(un[0:1], 0.0, 1.0))
    b1 = 1.0 - a_s
    b2 = a_s * un[1:2]
    lpx = lt[0:1] + b1 * lt[3:4] + b2 * lt[6:7]
    lpy = lt[1:2] + b1 * lt[4:5] + b2 * lt[7:8]
    lpz = lt[2:3] + b1 * lt[5:6] + b2 * lt[8:9]
    lnx = lt[4:5] * lt[8:9] - lt[5:6] * lt[7:8]
    lny = lt[5:6] * lt[6:7] - lt[3:4] * lt[8:9]
    lnz = lt[3:4] * lt[7:8] - lt[4:5] * lt[6:7]
    lnx, lny, lnz = _norm3(lnx, lny, lnz)

    dlx = lpx - px
    dly = lpy - py
    dlz = lpz - pz
    dist2 = jnp.maximum(dlx * dlx + dly * dly + dlz * dlz, 1e-20)
    dlx, dly, dlz = _norm3(dlx, dly, dlz)
    dist = jnp.sqrt(dist2)

    sh_o = jnp.concatenate([px, py, pz], axis=0)
    sh_d = jnp.concatenate([dlx, dly, dlz], axis=0)
    occ = _occluded(sh_o, sh_d, eps_shadow, (1.0 - eps_shadow) * dist,
                    W, T)

    Gn = jnp.maximum(-_dot3(dlx, dly, dlz, lnx, lny, lnz), 0.0) / dist2
    Gn = jnp.where(occ, 0.0, Gn)
    p1 = l_pmf * l_inv_area
    # frame flip for the BSDF (lambertian.inl:10-13)
    flip_f = _dot3(snx, sny, snz, wix, wiy, wiz) < 0
    fnx = jnp.where(flip_f, -snx, snx)
    fny = jnp.where(flip_f, -sny, sny)
    fnz = jnp.where(flip_f, -snz, snz)
    below_in = _dot3(ngx, ngy, ngz, wix, wiy, wiz) < 0
    below_l = _dot3(ngx, ngy, ngz, dlx, dly, dlz) < 0
    cos_l = jnp.maximum(_dot3(fnx, fny, fnz, dlx, dly, dlz), 0.0)
    f_scale = jnp.where(below_in | below_l, 0.0, cos_l / PI)
    p2n = jnp.where(below_in | below_l, 0.0, cos_l / PI) * Gn
    Le_ok = -_dot3(dlx, dly, dlz, lnx, lny, lnz) > 0     # one-sided
    nee_ok = alive & (Gn > 0) & (p1 > 0)
    w1 = (p1 * p1) / jnp.maximum(p1 * p1 + p2n * p2n, 1e-30)
    c1 = jnp.where(nee_ok & Le_ok, Gn * f_scale / jnp.maximum(p1, 1e-30) *
                   w1, 0.0)
    rad0 = rad0 + thr[0:1] * rows[20:21] * l_int_r * c1
    rad1 = rad1 + thr[1:2] * rows[21:22] * l_int_g * c1
    rad2 = rad2 + thr[2:3] * rows[22:23] * l_int_b * c1

    # ---- Lambertian cosine sampling -----------------------------------------
    phi = 2.0 * PI * un[4:5]
    tmp = jnp.sqrt(jnp.clip(1.0 - un[5:6], 0.0, 1.0))
    lx = jnp.cos(phi) * tmp
    ly = jnp.sin(phi) * tmp
    lz = jnp.sqrt(jnp.clip(un[5:6], 0.0, 1.0))
    tx, ty, tz, bx, by, bz = _onb(fnx, fny, fnz)
    ox2 = lx * tx + ly * bx + lz * fnx
    oy2 = lx * ty + ly * by + lz * fny
    oz2 = lx * tz + ly * bz + lz * fnz
    alive = alive & ~below_in
    below_o = _dot3(ngx, ngy, ngz, ox2, oy2, oz2) < 0
    cos_o = jnp.maximum(_dot3(fnx, fny, fnz, ox2, oy2, oz2), 0.0)
    p2s = cos_o / PI
    alive = alive & (p2s > 0)
    f_over_p = jnp.where(below_o, 0.0, 1.0)               # f/p = refl (masked)

    # ---- RR -----------------------------------------------------------------
    tmax = jnp.maximum(jnp.maximum(thr[0:1], thr[1:2]), thr[2:3])
    do_rr = (nv - 1.0) >= float(rr_depth)
    rr = jnp.where(do_rr, jnp.minimum(tmax, 0.95), 1.0)
    alive = alive & (un[7:8] <= rr)
    inv_rr = 1.0 / jnp.maximum(rr, 1e-20)

    thr_n0 = thr[0:1] * rows[20:21] * f_over_p * inv_rr
    thr_n1 = thr[1:2] * rows[21:22] * f_over_p * inv_rr
    thr_n2 = thr[2:3] * rows[22:23] * f_over_p * inv_rr

    return (jnp.concatenate([px, py, pz], axis=0),
            jnp.concatenate([ox2, oy2, oz2], axis=0),
            jnp.concatenate([thr_n0, thr_n1, thr_n2], axis=0),
            jnp.concatenate([rad0, rad1, rad2], axis=0),
            p2s,
            alive)


def _kernel(org_ref, dir_ref, thr_ref, rad_ref, nv_ref, dp_ref, pp_ref,
            un_ref, act_ref,
            woop_ref, tri_ref, light_ref, stair_ref,
            org_o, dir_o, thr_o, rad_o, dp_o, pp_o, alive_o,
            **statics):
    act_in = act_ref[:] > 0   # (1, B)
    org2, dir2, thr2, rad2, dp2, alive = _advance_core(
        org_ref[:], dir_ref[:], thr_ref[:], rad_ref[:], nv_ref[:],
        dp_ref[:], pp_ref[:], un_ref[:], act_in,
        woop_ref[:], tri_ref[:], light_ref[:], stair_ref[:], **statics)
    org_o[:] = org2
    dir_o[:] = dir2
    thr_o[:] = thr2
    rad_o[:] = rad2
    dp_o[:] = dp2
    pp_o[:] = org2
    alive_o[:] = alive.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def advance_kernel_t(scene, options, orgT, dirT, thrT, radT, nv, dir_pdf,
                     prevT, uniformsT, active, max_cap):
    """Batched advance in TRANSPOSED layout: vector args are (3, N) /
    (8, N); scalars (N,). Returns (orgT', dirT', thrT', radT', dir_pdf',
    prevT', alive) — no relayouts anywhere."""
    from lajolla_tpu.dtypes import intersection_eps, shadow_eps
    N = orgT.shape[1]
    T = scene.fp_tri.shape[1]
    L = scene.fp_light.shape[1]
    pad = (-N) % BLOCK
    padf = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)]) \
        if pad else a
    orgp = padf(orgT)
    dirp = padf(dirT)
    thrp = padf(thrT)
    radp = padf(radT)
    nvp = padf(nv.astype(jnp.float32)[None, :])
    dpp = padf(dir_pdf[None, :])
    prevp = padf(prevT)
    unp = padf(uniformsT)
    actp = padf(active.astype(jnp.float32)[None, :])
    Np = N + pad

    kern = functools.partial(
        _kernel, T=T, L=L,
        eps_isect=intersection_eps(scene.meta.scene_radius),
        eps_shadow=shadow_eps(scene.meta.scene_radius),
        max_depth=options.max_depth, rr_depth=options.rr_depth,
        max_cap=max_cap)
    blk = lambda i: (0, i)
    full = lambda i: (0, 0)
    row_spec = lambda r: pl.BlockSpec((r, BLOCK), blk,
                                      memory_space=pltpu.VMEM)
    tab_spec = lambda shape: pl.BlockSpec(shape, full,
                                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(Np // BLOCK,),
        in_specs=[row_spec(3), row_spec(3), row_spec(3), row_spec(3),
                  row_spec(1), row_spec(1), row_spec(3), row_spec(8),
                  row_spec(1),
                  tab_spec((3 * T, 4)), tab_spec((28, T)), tab_spec((8, L)),
                  tab_spec((1, T))],
        out_specs=[row_spec(3), row_spec(3), row_spec(3), row_spec(3),
                   row_spec(1), row_spec(3), row_spec(1)],
        out_shape=[jax.ShapeDtypeStruct((3, Np), jnp.float32),
                   jax.ShapeDtypeStruct((3, Np), jnp.float32),
                   jax.ShapeDtypeStruct((3, Np), jnp.float32),
                   jax.ShapeDtypeStruct((3, Np), jnp.float32),
                   jax.ShapeDtypeStruct((1, Np), jnp.float32),
                   jax.ShapeDtypeStruct((3, Np), jnp.float32),
                   jax.ShapeDtypeStruct((1, Np), jnp.float32)],
    )(orgp, dirp, thrp, radp, nvp, dpp, prevp, unp, actp,
      _woop_mat(scene.fp_woop), scene.fp_tri, scene.fp_light,
      scene.tri_stair_cdf[None, :])
    org2, dir2, thr2, rad2, dp2, pp2, alive = outs
    return (org2[:, :N], dir2[:, :N], thr2[:, :N], rad2[:, :N],
            dp2[0, :N], pp2[:, :N], alive[0, :N] > 0)
