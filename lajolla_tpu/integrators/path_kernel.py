"""Fused Pallas path-advance megakernel.

One kernel advances a block of lanes by one full path vertex: closest-hit
intersection (Woop brute-force triangles + stable-quadratic spheres),
shading-normal reconstruction, emissive-hit MIS, next-event estimation
(triangle staircase pick or sphere cone sampling) with an inlined shadow
cast, a static material switch (Lambertian / RoughPlastic) and Russian
roulette — entirely in VMEM, in the (row, lane) layout. This removes
every HBM round-trip and XLA op boundary inside the hot wavefront
iteration; the general engine (integrators/path.py) keeps the per-op
path for every other configuration.

Activation (static, on SceneMeta): materials within the in-kernel switch
set, mesh+sphere geometry, area lights only (no envmap), no media,
constant textures, brute-force intersector — the cbox and veach_mi
workloads qualify. The per-item counter-based uniforms come from the
same (seed, item, bounce, dim) pcg-hash stream the general engine draws
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
    from lajolla_tpu.scene.types import MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC
    kernel_mats = {MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC}
    return (set(meta.mat_types_present) <= kernel_mats and
            len(meta.mat_types_present) >= 1 and
            not meta.has_envmap and
            meta.num_media == 0 and
            not meta.needs_uv and
            not meta.use_bvh and
            meta.num_triangles >= 1 and
            meta.num_lights >= 1)


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


def _hit_mask(t, u, v, tnear, tfar, qf=None):
    """qf: (T, 1) quad flags — flagged rows accept the parallelogram
    max(u, v) <= 1 instead of the triangle u + v <= 1 (cast-space quad
    merging, scene/compile.py _merge_parallelograms)."""
    lim = 1.0 - u - v
    if qf is not None:
        # broadcast the f32 flag to full shape BEFORE comparing: Mosaic
        # rejects selects whose i1 condition is a (T, 1) broadcast
        # ("unsupported target bitwidth for truncation")
        qfb = jnp.broadcast_to(qf, u.shape)
        lim = jnp.where(qfb > 0.0, 1.0 - jnp.maximum(u, v), lim)
    m = jnp.minimum(jnp.minimum(u, v), lim)
    hit = (m >= 0.0) & (t > tnear)
    if tfar is not None:
        hit = hit & (t < tfar)
    return hit


def _intersect(o, d, tnear, tfar, W, T, qf):
    """Woop brute force over the cast table. o,d: (3,B); tnear/tfar:
    (1,B)/scalar/None(=inf); qf: (T,1) quad flags or None (no merged
    quads — skips the flag selects and returns qb == 0). Returns (t_best
    (1,B), sel (T,B) one-hot, u (1,B), v (1,B), qb (1,B) winner-is-quad)
    — u/v in the REP triangle's frame (caller remaps u+v>1 quad hits)."""
    if CLOSEST_DIVFREE and tfar is None:
        return _intersect_divfree(o, d, tnear, W, T, qf)
    t, u, v = _woop_tuv(o, d, W, T)
    hit = _hit_mask(t, u, v, tnear, tfar, qf)
    t = jnp.where(hit, t, INF)
    t_best = jnp.min(t, axis=0, keepdims=True)
    sel = (t == t_best) & hit
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    first = jnp.min(jnp.where(sel, iota, T), axis=0, keepdims=True)
    sel = sel & (iota == first)
    ub = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
    vb = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
    if qf is None:
        qb = jnp.zeros_like(ub)
    else:
        qb = jnp.sum(jnp.where(sel, jnp.broadcast_to(qf, sel.shape), 0.0),
                     axis=0, keepdims=True)
    return t_best, sel, ub, vb, qb


OCC_DIVFREE = True  # division-free shadow predicate (A/B'd on TPU; the
                    # (T, B) f32 divide is the costliest elementwise op
                    # in the any-hit sweep and a boolean needs none)

CLOSEST_DIVFREE = False  # division-free CLOSEST cast: hit tests as sign
                         # predicates (like OCC_DIVFREE) and the t-min
                         # as a cross-multiplied tournament over (w, dz)
                         # pairs flipped to dz >= 0 — ONE divide per
                         # lane for the winner instead of (T, B).
                         # Winner t is bit-identical ((-w)/(-d) rounds
                         # like w/d); near-ties can pick a prim whose t
                         # differs by an ulp, so engine-parity tests
                         # stay statistical when this is on. Default off
                         # until the TPU A/B (/root/work/divfree_ab.py).


def _intersect_divfree(o, d, tnear, W, T, qf):
    """Closest hit over the cast table with NO (T, B) divide. Returns
    the same (t_best, sel, ub, vb, qb) as _intersect (tfar == None
    form). See CLOSEST_DIVFREE."""
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
    w = -oz
    U = ox * dz + w * dx                  # u = U/dz, v = V/dz
    V = oy * dz + w * dy
    if qf is None:
        lim_ok = (U + V - dz) * dz <= 0.0
    else:
        # float-valued select with a full-shape condition (Mosaic cannot
        # broadcast a (T, 1) i1 condition or select between i1 operands)
        qfb = jnp.broadcast_to(qf, U.shape)
        lim_val = jnp.where(qfb > 0.0,
                            jnp.maximum((U - dz) * dz, (V - dz) * dz),
                            (U + V - dz) * dz)
        lim_ok = lim_val <= 0.0
    hit = ((U * dz >= 0.0) & (V * dz >= 0.0) & lim_ok &
           ((w - tnear * dz) * dz > 0.0))
    # orient every fraction to positive denominator; misses -> (1, 0)
    # (acts as +inf in the cross-multiplied order)
    neg = dz < 0.0
    wp = jnp.where(hit, jnp.where(neg, -w, w), 1.0)
    dp = jnp.where(hit, jnp.where(neg, -dz, dz), 0.0)
    # tournament min: pad T to a power of two with +inf rows
    n = 1
    while n < T:
        n *= 2
    if n > T:
        pad_w = jnp.ones((n - T, wp.shape[1]), wp.dtype)
        pad_d = jnp.zeros((n - T, dp.shape[1]), dp.dtype)
        wt = jnp.concatenate([wp, pad_w], axis=0)
        dt = jnp.concatenate([dp, pad_d], axis=0)
    else:
        wt, dt = wp, dp
    while n > 1:
        h = n // 2
        wa, wb_ = wt[:h], wt[h:n]
        da, db_ = dt[:h], dt[h:n]
        less = wa * db_ < wb_ * da        # a < b with positive denoms
        wt = jnp.where(less, wa, wb_)
        dt = jnp.where(less, da, db_)
        n = h
    w_best, d_best = wt, dt               # (1, B)
    t_best = jnp.where(d_best > 0.0,
                       w_best / jnp.where(d_best > 0.0, d_best, 1.0),
                       INF)
    # winner one-hot: exact rational tie with the winning fraction
    sel = hit & (wp * d_best == w_best * dp)
    iota = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 0)
    first = jnp.min(jnp.where(sel, iota, T), axis=0, keepdims=True)
    sel = sel & (iota == first)
    # winner's u, v (and quad flag) via one-hot sums; 2 divides per lane
    Uw = jnp.sum(jnp.where(sel, U, 0.0), axis=0, keepdims=True)
    Vw = jnp.sum(jnp.where(sel, V, 0.0), axis=0, keepdims=True)
    dzw = jnp.sum(jnp.where(sel, dz, 0.0), axis=0, keepdims=True)
    safe = jnp.where(jnp.abs(dzw) > 0.0, dzw, 1.0)
    ub = Uw / safe
    vb = Vw / safe
    if qf is None:
        qb = jnp.zeros_like(ub)
    else:
        qb = jnp.sum(jnp.where(sel, jnp.broadcast_to(qf, sel.shape), 0.0),
                     axis=0, keepdims=True)
    return t_best, sel, ub, vb, qb


def _occluded(o, d, tnear, tfar, W, T, qf):
    """Any-hit shadow cast: no closest-hit reduction, no one-hot select.
    qf: (T, 1) quad flags (see _hit_mask). Returns occ (1, B) bool.

    Division-free form: with U = ox*dz - oz*dx, V = oy*dz - oz*dy
    (so u = U/dz, v = V/dz, t = -oz/dz), every hit predicate becomes a
    sign test after multiplying through by dz (dz == 0 rows make all
    products 0 and the strict t>tnear test false — same no-hit outcome
    as the NaN propagation in the dividing form):
      u >= 0        <=>  U*dz >= 0
      v >= 0        <=>  V*dz >= 0
      u + v <= 1    <=>  (U + V - dz)*dz <= 0
      t > tnear     <=>  (-oz - tnear*dz)*dz > 0
      t < tfar      <=>  (-oz - tfar*dz)*dz < 0"""
    if not OCC_DIVFREE:
        t, u, v = _woop_tuv(o, d, W, T)
        hit = _hit_mask(t, u, v, tnear, tfar, qf)
        return jnp.max(hit.astype(jnp.float32), axis=0,
                       keepdims=True) > 0.0

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
    w = -oz
    U = ox * dz + w * dx
    V = oy * dz + w * dy
    # quad rows: u <= 1 and v <= 1 replace u + v <= 1 (same multiply-
    # through-by-dz trick: u <= 1 <=> (U - dz) * dz <= 0)
    if qf is None:
        lim_ok = (U + V - dz) * dz <= 0.0
    else:
        # float-valued select with a full-shape condition (Mosaic cannot
        # broadcast a (T, 1) i1 condition or select between i1 operands)
        qfb = jnp.broadcast_to(qf, U.shape)
        lim_val = jnp.where(qfb > 0.0,
                            jnp.maximum((U - dz) * dz, (V - dz) * dz),
                            (U + V - dz) * dz)
        lim_ok = lim_val <= 0.0
    hit = ((U * dz >= 0.0) & (V * dz >= 0.0) & lim_ok &
           ((w - tnear * dz) * dz > 0.0))
    if tfar is not None:
        hit = hit & ((w - tfar * dz) * dz < 0.0)
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


# ---------------------------------------------------------------------------
# Sphere leaves (stable quadratic, shapes/sphere.inl:15-38; dirs normalized
# so a == 1)
# ---------------------------------------------------------------------------

def _sphere_tuv(o, d, sph, S, tnear, tfar):
    """All-sphere quadratic. o, d: (3,B); sph: (S, 24) with center in
    cols 0:3, radius col 3. Returns t (S, B) with misses at +inf."""
    cx, cy, cz = sph[:, 0:1], sph[:, 1:2], sph[:, 2:3]    # (S, 1)
    r = sph[:, 3:4]
    ocx = o[0:1] - cx
    ocy = o[1:2] - cy
    ocz = o[2:3] - cz
    b = 2.0 * (ocx * d[0:1] + ocy * d[1:2] + ocz * d[2:3])
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * jnp.where(b >= 0.0, b + sq, b - sq)
    t1 = c / jnp.where(jnp.abs(q) > 1e-30, q, 1e-30)
    tlo = jnp.minimum(q, t1)
    thi = jnp.maximum(q, t1)
    ok = disc >= 0.0

    def in_rng(t):
        r = ok & (t > tnear)
        if tfar is not None:
            r = r & (t < tfar)
        return r

    t = jnp.where(in_rng(tlo), tlo, jnp.where(in_rng(thi), thi, INF))
    # radius 0 = padding row: never hits
    return jnp.where(r > 0.0, t, INF)


def _sphere_closest(o, d, tnear, sph, S):
    t = _sphere_tuv(o, d, sph, S, tnear, None)
    t_best = jnp.min(t, axis=0, keepdims=True)
    sel = (t == t_best) & (t < INF)
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    first = jnp.min(jnp.where(sel, iota, S), axis=0, keepdims=True)
    sel = sel & (iota == first)
    return t_best, sel


def _sphere_anyhit(o, d, tnear, tfar, sph, S):
    t = _sphere_tuv(o, d, sph, S, tnear, tfar)
    return jnp.min(t, axis=0, keepdims=True) < INF


def _srows(sel, sph):
    """(S, B) one-hot x (S, C) table → (C, B), exact."""
    return jax.lax.dot_general(
        sph, sel.astype(jnp.float32), (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Row-form BSDF math (everything (1,B)/(3-tuple of (1,B)); mirrors
# materials/common.py + materials/roughplastic.py → reference
# microfacet.h / materials/roughplastic.inl)
# ---------------------------------------------------------------------------

def _fresnel_dielectric(n_dot_i, eta):
    """microfacet.h:42-56; eta = n_t/n_i; 1 on TIR."""
    n_dot_t_sq = 1.0 - (1.0 - n_dot_i * n_dot_i) / (eta * eta)
    n_dot_t = jnp.sqrt(jnp.maximum(n_dot_t_sq, 0.0))
    c = jnp.abs(n_dot_i)
    rs = (c - eta * n_dot_t) / (c + eta * n_dot_t)
    rp = (eta * c - n_dot_t) / (eta * c + n_dot_t)
    F = 0.5 * (rs * rs + rp * rp)
    return jnp.where(n_dot_t_sq < 0.0, 1.0, F)


def _ggx_d(n_dot_h, roughness):
    alpha = roughness * roughness
    a2 = alpha * alpha
    t = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * t * t, 1e-20)


def _smith_g1(n_dot_v, roughness):
    """Isotropic Smith G1; for normalized v, x²+y² = 1-z² in the shading
    frame, so only n·v is needed (microfacet.h:75-81)."""
    alpha = roughness * roughness
    a2 = alpha * alpha
    z2 = n_dot_v * n_dot_v
    lam = (-1.0 + jnp.sqrt(1.0 + (1.0 - z2) * a2 /
                           jnp.maximum(z2, 1e-20))) / 2.0
    return 1.0 / (1.0 + lam)


def _luminance(r, g, b):
    return r * 0.212671 + g * 0.715160 + b * 0.072169


def _rp_eval_pdf(wi, wo, fn, ng, kd, ks, rough, eta):
    """RoughPlastic eval (f·cos) + sample pdf for direction wo.
    wi/wo/fn/ng: 3-tuples of (1,B); kd/ks: 3-tuples; rough/eta: (1,B).
    Returns (f 3-tuple, pdf)."""
    below = (_dot3(*ng, *wi) < 0) | (_dot3(*ng, *wo) < 0)
    hx, hy, hz = _norm3(wi[0] + wo[0], wi[1] + wo[1], wi[2] + wo[2])
    n_dot_h = _dot3(*fn, hx, hy, hz)
    n_dot_in = _dot3(*fn, *wi)
    n_dot_out = _dot3(*fn, *wo)
    invalid = below | (n_dot_out <= 0) | (n_dot_h <= 0)
    h_dot_out = _dot3(hx, hy, hz, *wo)
    h_dot_in = _dot3(hx, hy, hz, *wi)
    F_o = _fresnel_dielectric(h_dot_out, eta)
    D = _ggx_d(n_dot_h, rough)
    G_in = _smith_g1(n_dot_in, rough)
    G = G_in * _smith_g1(n_dot_out, rough)
    spec_s = (G * F_o * D) / jnp.maximum(4.0 * n_dot_in * n_dot_out, 1e-20)
    F_i = _fresnel_dielectric(h_dot_in, eta)
    diff_s = (1.0 - F_o) * (1.0 - F_i) / PI
    fr = (ks[0] * spec_s + kd[0] * diff_s) * n_dot_out
    fg = (ks[1] * spec_s + kd[1] * diff_s) * n_dot_out
    fb = (ks[2] * spec_s + kd[2] * diff_s) * n_dot_out
    z = jnp.zeros_like(fr)
    f = (jnp.where(invalid, z, fr), jnp.where(invalid, z, fg),
         jnp.where(invalid, z, fb))
    lS = _luminance(*ks)
    lR = _luminance(*kd)
    total = jnp.maximum(lS + lR, 1e-20)
    invalid_p = invalid | (lS + lR <= 0)
    pdf = (lS / total) * (G_in * D) / jnp.maximum(4.0 * n_dot_in, 1e-20) + \
        (1.0 - lS / total) * n_dot_out / PI
    return f, jnp.where(invalid_p, 0.0, pdf)


def _cosine_dir(fn, u0, u1):
    """Cosine-hemisphere direction around fn (material.cpp:4-11)."""
    phi = 2.0 * PI * u0
    tmp = jnp.sqrt(jnp.clip(1.0 - u1, 0.0, 1.0))
    lx = jnp.cos(phi) * tmp
    ly = jnp.sin(phi) * tmp
    lz = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    tx, ty, tz, bx, by, bz = _onb(*fn)
    return (lx * tx + ly * bx + lz * fn[0],
            lx * ty + ly * by + lz * fn[1],
            lx * tz + ly * bz + lz * fn[2])


def _rp_sample(wi, fn, kd, ks, rough, u0, u1, w):
    """RoughPlastic direction sampling (roughplastic.inl sampling op):
    Fresnel-weighted choice between VNDF-sampled GGX reflection and
    cosine diffuse; both lobes consume the same (u0, u1) as the
    reference. Returns (dir_out 3-tuple, valid)."""
    lS = _luminance(*ks)
    lR = _luminance(*kd)
    spec_prob = lS / jnp.maximum(lS + lR, 1e-20)
    valid = lS + lR > 0

    # VNDF half-vector (Heitz 2018, microfacet.h:85-114), local frame
    tx, ty, tz, bx, by, bz = _onb(*fn)
    lix = _dot3(tx, ty, tz, *wi)
    liy = _dot3(bx, by, bz, *wi)
    liz = _dot3(*fn, *wi)
    flip = liz < 0
    lix = jnp.where(flip, -lix, lix)
    liy = jnp.where(flip, -liy, liy)
    liz = jnp.where(flip, -liz, liz)
    alpha = rough * rough
    hvx, hvy, hvz = _norm3(alpha * lix, alpha * liy, liz)
    rr_ = jnp.sqrt(jnp.clip(u0, 0.0, 1.0))
    phi = 2.0 * PI * u1
    t1 = rr_ * jnp.cos(phi)
    t2 = rr_ * jnp.sin(phi)
    s = 0.5 * (1.0 + hvz)
    t2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - t1 * t1, 0.0)) + s * t2
    dnz = jnp.sqrt(jnp.maximum(1.0 - t1 * t1 - t2 * t2, 0.0))
    ftx, fty, ftz, fbx, fby, fbz = _onb(hvx, hvy, hvz)
    hnx = t1 * ftx + t2 * fbx + dnz * hvx
    hny = t1 * fty + t2 * fby + dnz * hvy
    hnz = t1 * ftz + t2 * fbz + dnz * hvz
    hlx, hly, hlz = _norm3(alpha * hnx, alpha * hny,
                           jnp.maximum(hnz, 0.0))
    hlx = jnp.where(flip, -hlx, hlx)
    hly = jnp.where(flip, -hly, hly)
    hlz = jnp.where(flip, -hlz, hlz)
    # to world
    hx = hlx * tx + hly * bx + hlz * fn[0]
    hy = hlx * ty + hly * by + hlz * fn[1]
    hz = hlx * tz + hly * bz + hlz * fn[2]
    i_dot_h = _dot3(*wi, hx, hy, hz)
    rx, ry, rz = _norm3(2.0 * i_dot_h * hx - wi[0],
                        2.0 * i_dot_h * hy - wi[1],
                        2.0 * i_dot_h * hz - wi[2])

    dx, dy, dz = _cosine_dir(fn, u0, u1)
    take_spec = w < spec_prob
    return ((jnp.where(take_spec, rx, dx),
             jnp.where(take_spec, ry, dy),
             jnp.where(take_spec, rz, dz)), valid)


def _eval_pdf_dispatch(mats, mt, wi, wo, fn, ng, kd, ks, rough, eta):
    """BSDF eval (f·cos) + pdf, switched on the static material set.
    Lambertian mirrors materials/lambertian.py (lambertian.inl);
    RoughPlastic above."""
    from lajolla_tpu.scene.types import MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC
    below = (_dot3(*ng, *wi) < 0) | (_dot3(*ng, *wo) < 0)
    res = []
    if MAT_LAMBERTIAN in mats:
        cos_o = jnp.maximum(_dot3(*fn, *wo), 0.0)
        sc = jnp.where(below, 0.0, cos_o / PI)
        res.append((MAT_LAMBERTIAN,
                    (kd[0] * sc, kd[1] * sc, kd[2] * sc), sc))
    if MAT_ROUGH_PLASTIC in mats:
        f, p = _rp_eval_pdf(wi, wo, fn, ng, kd, ks, rough, eta)
        res.append((MAT_ROUGH_PLASTIC, f, p))
    if len(res) == 1:
        return res[0][1], res[0][2]
    f, p = res[0][1], res[0][2]
    for tag, f2, p2 in res[1:]:
        m = mt == float(tag)
        f = (jnp.where(m, f2[0], f[0]), jnp.where(m, f2[1], f[1]),
             jnp.where(m, f2[2], f[2]))
        p = jnp.where(m, p2, p)
    return f, p


def _sample_dispatch(mats, mt, wi, fn, ng, kd, ks, rough, u0, u1, w):
    """BSDF direction sampling switched on the static material set.
    Returns (dir_out 3-tuple, valid). valid entries may be None
    (= unconditionally valid); Mosaic chokes on constant bool vectors,
    so "always true" is represented structurally."""
    from lajolla_tpu.scene.types import MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC
    below_in = _dot3(*ng, *wi) < 0
    res = []
    if MAT_LAMBERTIAN in mats:
        res.append((MAT_LAMBERTIAN, _cosine_dir(fn, u0, u1), None))
    if MAT_ROUGH_PLASTIC in mats:
        res.append((MAT_ROUGH_PLASTIC,
                    *_rp_sample(wi, fn, kd, ks, rough, u0, u1, w)))
    dir_out, valid = res[0][1], res[0][2]
    for tag, d2, v2 in res[1:]:
        m = mt == float(tag)
        dir_out = (jnp.where(m, d2[0], dir_out[0]),
                   jnp.where(m, d2[1], dir_out[1]),
                   jnp.where(m, d2[2], dir_out[2]))
        if valid is None and v2 is None:
            valid = None
        elif valid is None:
            valid = v2 | ~m
        elif v2 is None:
            valid = valid | m
        else:
            valid = (m & v2) | (~m & valid)
    return dir_out, (~below_in if valid is None else valid & ~below_in)


def _cone_pdf_area(c, r, ref, point, n, dl, dist2):
    """Solid-angle cone pdf toward a sphere converted to area measure,
    with the inside-uniform fallback (shapes/sphere.inl:210-230).
    c: center 3-tuple (broadcastable rows), r radius, ref: the vertex the
    light was sampled from, point/n: the light point and its normal,
    dl: normalize(point-ref), dist2: |point-ref|²."""
    d2 = ((c[0] - ref[0]) ** 2 + (c[1] - ref[1]) ** 2 +
          (c[2] - ref[2]) ** 2)
    inside = d2 < r * r
    uniform = 1.0 / jnp.maximum(4.0 * PI * r * r, 1e-20)
    cos_el_max = jnp.sqrt(jnp.maximum(
        0.0, 1.0 - r * r / jnp.maximum(d2, 1e-20)))
    pdf_solid = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_el_max), 1e-20)
    pdf_area = pdf_solid * jnp.abs(_dot3(*n, *dl)) / jnp.maximum(dist2,
                                                                 1e-20)
    return jnp.where(inside, uniform, pdf_area)


def _advance_core(o, d, thr, rad, nv, dir_pdf, prev, un, act_in,
                  W, W_occ, tri, triA, triB, qf, qf_occ, light, stair,
                  sph,
                  *, T: int, TC: int, T_OCC: int, L: int, S: int,
                  mats: tuple, has_quads: bool = True,
                  eps_isect: float, eps_shadow: float,
                  max_depth: int, rr_depth: int, max_cap: int):
    """One path-vertex advance on plain (row, B) arrays; shared by the
    per-bounce kernel below and the fully-fused persistent megakernel
    (path_megakernel.py). W is the host-packed (3TC, 4) CAST-space Woop
    matrix (_woop_mat — Mosaic cannot re-concatenate it in-kernel);
    triA/triB the (40, TC) per-member attribute tables of the
    quad-merged cast list (tri stays (40, T) for light sampling);
    qf/qf_occ the (TC, 1)/(T_OCC, 1) quad flags; sph the (S, 24) sphere
    table; mats the static material-type set the kernel specializes on.
    Returns (org', dir', thr', rad', dir_pdf', prev', alive)."""

    # ---- closest hit: triangles + spheres ----------------------------------
    # has_quads False (no parallelograms merged: cast_alt == cast_src,
    # triB == triA) statically drops the quad flag selects, the second
    # one-hot attribute matmul, and the barycentric remap — XLA cannot
    # CSE the triA/triB matmuls itself (distinct buffers, equal contents)
    if not has_quads:
        qf = qf_occ = None
    t_tri, sel, ub, vb, qb = _intersect(o, d, eps_isect, None, W, TC, qf)
    if S:
        t_sph, ssel = _sphere_closest(o, d, eps_isect, sph, S)
        sph_win = t_sph < t_tri
        t_best = jnp.minimum(t_tri, t_sph)
        srows = _srows(ssel, sph)                         # (24, B)
    else:
        sph_win = jnp.zeros_like(t_tri) > 0
        t_best = t_tri
    valid = (t_best < INF) & act_in                       # (1, B)
    self_f = sel.astype(jnp.float32)
    # quad hits with u + v > 1 belong to the partner (B) triangle:
    # attributes from triB, barycentrics remapped exactly
    if has_quads:
        back = (qb > 0.0) & (ub + vb > 1.0)
        rows = jnp.where(back, _rows(self_f, triB),
                         _rows(self_f, triA))             # (40, B)
        ub, vb = (jnp.where(back, 1.0 - vb, ub),
                  jnp.where(back, ub + vb - 1.0, vb))
    else:
        rows = _rows(self_f, triA)                        # (40, B)

    # Sanitize the miss distance: an inf position would turn masked-out
    # downstream products (NaN * 0) into NaNs in the radiance rows.
    t_eff = jnp.where(valid, t_best, 0.0)
    px = o[0:1] + t_eff * d[0:1]
    py = o[1:2] + t_eff * d[1:2]
    pz = o[2:3] + t_eff * d[2:3]

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

    if S:
        # sphere normal (p - c)/r; shading frame == geometric
        # (shapes/sphere.inl:235-260; isotropic BSDFs only in-kernel)
        inv_r = 1.0 / jnp.maximum(srows[3:4], 1e-20)
        sngx = (px - srows[0:1]) * inv_r
        sngy = (py - srows[1:2]) * inv_r
        sngz = (pz - srows[2:3]) * inv_r
        sngx, sngy, sngz = _norm3(sngx, sngy, sngz)
        ngx = jnp.where(sph_win, sngx, ngx)
        ngy = jnp.where(sph_win, sngy, ngy)
        ngz = jnp.where(sph_win, sngz, ngz)
        snx = jnp.where(sph_win, sngx, snx)
        sny = jnp.where(sph_win, sngy, sny)
        snz = jnp.where(sph_win, sngz, snz)

    # unified per-hit record (light + material parameters)
    def pick(tri_row, sph_row):
        return jnp.where(sph_win, sph_row, tri_row) if S else tri_row
    h_light = pick(rows[19:20], srows[4:5] if S else None)
    le_r = pick(rows[23:24], srows[15:16] if S else None)
    le_g = pick(rows[24:25], srows[16:17] if S else None)
    le_b = pick(rows[25:26], srows[17:18] if S else None)
    h_pmf = pick(rows[27:28], srows[14:15] if S else None)
    kd = (pick(rows[20:21], srows[6:7] if S else None),
          pick(rows[21:22], srows[7:8] if S else None),
          pick(rows[22:23], srows[8:9] if S else None))
    need_mat = len(mats) > 1 or mats != (0,)
    if need_mat:
        mt = pick(rows[28:29], srows[5:6] if S else None)
        ks = (pick(rows[29:30], srows[9:10] if S else None),
              pick(rows[30:31], srows[10:11] if S else None),
              pick(rows[31:32], srows[11:12] if S else None))
        rough = jnp.clip(pick(rows[32:33], srows[12:13] if S else None),
                         0.01, 1.0)
        eta = pick(rows[33:34], srows[13:14] if S else None)
    else:
        mt = ks = rough = eta = None

    wix, wiy, wiz = -d[0:1], -d[1:2], -d[2:3]             # dir_view

    # ---- emissive hit + MIS (cached-pdf form) ------------------------------
    hit_light = valid & (h_light >= 0)
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
    p1e = h_pmf * rows[26:27]                             # pmf * 1/area
    if S:
        # sphere lights: cone pdf from the previous vertex
        # (shapes/sphere.inl:210-230), not 1/area
        pv = (prev[0:1], prev[1:2], prev[2:3])
        p1e_s = h_pmf * _cone_pdf_area(
            (srows[0:1], srows[1:2], srows[2:3]), srows[3:4], pv,
            (px, py, pz), (ngx, ngy, ngz),
            (d[0:1], d[1:2], d[2:3]), dist2p)
        p1e = jnp.where(sph_win, p1e_s, p1e)
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
    lrow = _rows(lsel, light)                             # (16, B)
    l_pmf = lrow[1:2]
    l_int_r, l_int_g, l_int_b = lrow[2:3], lrow[3:4], lrow[4:5]
    l_inv_area = lrow[5:6]
    l_shape = lrow[6:7]
    # mesh lights: pick triangle via staircase (shape_id + cdf), then
    # sqrt-uv barycentric point (triangle_mesh.inl:24-38)
    key = l_shape + un[3:4]
    tsel_idx = jnp.sum((stair.T < key).astype(jnp.float32), axis=0,
                      keepdims=True)
    tsel_idx = jnp.minimum(tsel_idx, float(T - 1)).astype(jnp.int32)
    tiota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    tsel = (tiota == tsel_idx).astype(jnp.float32)        # (T, B)
    lt = _rows(tsel, tri)                                 # (40, B)
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
    p1_area = l_inv_area

    if S:
        # sphere lights: cone sampling toward the sphere with
        # inside-uniform fallback (shapes/sphere.inl:156-204)
        is_sl = lrow[7:8] > 0
        lcx, lcy, lcz = lrow[8:9], lrow[9:10], lrow[10:11]
        lr = lrow[11:12]
        dcx_ = lcx - px
        dcy_ = lcy - py
        dcz_ = lcz - pz
        d2c = jnp.maximum(dcx_ * dcx_ + dcy_ * dcy_ + dcz_ * dcz_, 1e-20)
        inside = d2c < lr * lr
        # inside: uniform sphere point
        zu = 1.0 - 2.0 * un[0:1]
        ru = jnp.sqrt(jnp.maximum(0.0, 1.0 - zu * zu))
        phiu = 2.0 * PI * un[1:2]
        n_in = (ru * jnp.cos(phiu), ru * jnp.sin(phiu), zu)
        # outside: cone
        tcx, tcy, tcz = _norm3(dcx_, dcy_, dcz_)
        ftx, fty, ftz, fbx, fby, fbz = _onb(tcx, tcy, tcz)
        sin_el_max_sq = lr * lr / d2c
        cos_el_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_el_max_sq))
        cos_el = (1.0 - un[0:1]) + un[0:1] * cos_el_max
        sin_el = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_el * cos_el))
        azim = 2.0 * PI * un[1:2]
        dc = jnp.sqrt(d2c)
        ds = dc * cos_el - jnp.sqrt(jnp.maximum(
            0.0, lr * lr - dc * dc * sin_el * sin_el))
        cos_a = (dc * dc + lr * lr - ds * ds) / jnp.maximum(
            2.0 * dc * lr, 1e-20)
        sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
        ca = jnp.cos(azim)
        sa = jnp.sin(azim)
        n_out = (-(sin_a * ca * ftx + sin_a * sa * fbx + cos_a * tcx),
                 -(sin_a * ca * fty + sin_a * sa * fby + cos_a * tcy),
                 -(sin_a * ca * ftz + sin_a * sa * fbz + cos_a * tcz))
        lnsx = jnp.where(inside, n_in[0], n_out[0])
        lnsy = jnp.where(inside, n_in[1], n_out[1])
        lnsz = jnp.where(inside, n_in[2], n_out[2])
        lpx = jnp.where(is_sl, lcx + lr * lnsx, lpx)
        lpy = jnp.where(is_sl, lcy + lr * lnsy, lpy)
        lpz = jnp.where(is_sl, lcz + lr * lnsz, lpz)
        lnx = jnp.where(is_sl, lnsx, lnx)
        lny = jnp.where(is_sl, lnsy, lny)
        lnz = jnp.where(is_sl, lnsz, lnz)

    dlx = lpx - px
    dly = lpy - py
    dlz = lpz - pz
    dist2 = jnp.maximum(dlx * dlx + dly * dly + dlz * dlz, 1e-20)
    dlx, dly, dlz = _norm3(dlx, dly, dlz)
    dist = jnp.sqrt(dist2)

    if S:
        p1_sph = _cone_pdf_area((lcx, lcy, lcz), lr, (px, py, pz),
                                (lpx, lpy, lpz), (lnx, lny, lnz),
                                (dlx, dly, dlz), dist2)
        p1_area = jnp.where(is_sl, p1_sph, p1_area)

    sh_o = jnp.concatenate([px, py, pz], axis=0)
    sh_d = jnp.concatenate([dlx, dly, dlz], axis=0)
    sh_far = (1.0 - eps_shadow) * dist
    # occluder subset: convex-envelope tris can't block an interior
    # shadow segment (scene/compile.py fp_woop_occ — cbox drops 10 of 32)
    occ = _occluded(sh_o, sh_d, eps_shadow, sh_far, W_occ, T_OCC, qf_occ)
    if S:
        occ = occ | _sphere_anyhit(sh_o, sh_d, eps_shadow, sh_far, sph, S)

    Gn = jnp.maximum(-_dot3(dlx, dly, dlz, lnx, lny, lnz), 0.0) / dist2
    Gn = jnp.where(occ, 0.0, Gn)
    p1 = l_pmf * p1_area
    # frame flip for the BSDF (lambertian.inl:10-13)
    flip_f = _dot3(snx, sny, snz, wix, wiy, wiz) < 0
    fn = (jnp.where(flip_f, -snx, snx), jnp.where(flip_f, -sny, sny),
          jnp.where(flip_f, -snz, snz))
    ng = (ngx, ngy, ngz)
    wi = (wix, wiy, wiz)
    f_nee, p2n_sa = _eval_pdf_dispatch(mats, mt, wi, (dlx, dly, dlz),
                                       fn, ng, kd, ks, rough, eta)
    p2n = p2n_sa * Gn
    Le_ok = -_dot3(dlx, dly, dlz, lnx, lny, lnz) > 0     # one-sided
    nee_ok = alive & (Gn > 0) & (p1 > 0)
    w1 = (p1 * p1) / jnp.maximum(p1 * p1 + p2n * p2n, 1e-30)
    c1 = jnp.where(nee_ok & Le_ok,
                   Gn / jnp.maximum(p1, 1e-30) * w1, 0.0)
    rad0 = rad0 + thr[0:1] * f_nee[0] * l_int_r * c1
    rad1 = rad1 + thr[1:2] * f_nee[1] * l_int_g * c1
    rad2 = rad2 + thr[2:3] * f_nee[2] * l_int_b * c1

    # ---- BSDF sampling ------------------------------------------------------
    dir_out, samp_valid = _sample_dispatch(mats, mt, wi, fn, ng, kd, ks,
                                           rough, un[4:5], un[5:6],
                                           un[6:7])
    alive = alive & samp_valid
    f2, p2s = _eval_pdf_dispatch(mats, mt, wi, dir_out, fn, ng, kd, ks,
                                 rough, eta)
    alive = alive & (p2s > 0)

    # ---- RR -----------------------------------------------------------------
    tmax = jnp.maximum(jnp.maximum(thr[0:1], thr[1:2]), thr[2:3])
    do_rr = (nv - 1.0) >= float(rr_depth)
    rr = jnp.where(do_rr, jnp.minimum(tmax, 0.95), 1.0)
    alive = alive & (un[7:8] <= rr)
    inv_p = 1.0 / jnp.maximum(p2s * rr, 1e-30)

    thr_n0 = thr[0:1] * f2[0] * inv_p
    thr_n1 = thr[1:2] * f2[1] * inv_p
    thr_n2 = thr[2:3] * f2[2] * inv_p

    return (jnp.concatenate([px, py, pz], axis=0),
            jnp.concatenate(list(dir_out), axis=0),
            jnp.concatenate([thr_n0, thr_n1, thr_n2], axis=0),
            jnp.concatenate([rad0, rad1, rad2], axis=0),
            p2s,
            alive)


def _kernel(org_ref, dir_ref, thr_ref, rad_ref, nv_ref, dp_ref, pp_ref,
            un_ref, act_ref,
            woop_ref, woop_occ_ref, tri_ref, triA_ref, triB_ref,
            qf_ref, qfocc_ref, light_ref, stair_ref,
            sph_ref,
            org_o, dir_o, thr_o, rad_o, dp_o, pp_o, alive_o,
            **statics):
    act_in = act_ref[:] > 0   # (1, B)
    org2, dir2, thr2, rad2, dp2, alive = _advance_core(
        org_ref[:], dir_ref[:], thr_ref[:], rad_ref[:], nv_ref[:],
        dp_ref[:], pp_ref[:], un_ref[:], act_in,
        woop_ref[:], woop_occ_ref[:], tri_ref[:], triA_ref[:],
        triB_ref[:], qf_ref[:], qfocc_ref[:], light_ref[:],
        stair_ref[:], sph_ref[:],
        **statics)
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

    S = scene.meta.num_spheres
    TC = scene.fp_woop.shape[0]
    T_OCC = scene.fp_woop_occ.shape[0]
    kern = functools.partial(
        _kernel, T=T, TC=TC, T_OCC=T_OCC, L=L, S=S,
        mats=scene.meta.mat_types_present,
        has_quads=scene.meta.has_quads,
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
                  tab_spec((3 * TC, 4)), tab_spec((3 * T_OCC, 4)),
                  tab_spec((40, T)), tab_spec((40, TC)),
                  tab_spec((40, TC)), tab_spec((TC, 1)),
                  tab_spec((T_OCC, 1)), tab_spec((16, L)),
                  tab_spec((1, T)), tab_spec((max(S, 1), 24))],
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
      _woop_mat(scene.fp_woop), _woop_mat(scene.fp_woop_occ),
      scene.fp_tri, scene.fp_tri[:, scene.cast_src],
      scene.fp_tri[:, scene.cast_alt], scene.cast_quad[:, None],
      scene.cast_occ_quad[:, None], scene.fp_light,
      scene.tri_stair_cdf[None, :], scene.fp_sph)
    org2, dir2, thr2, rad2, dp2, pp2, alive = outs
    return (org2[:, :N], dir2[:, :N], thr2[:, :N], rad2[:, :N],
            dp2[0, :N], pp2[:, :N], alive[0, :N] > 0)
