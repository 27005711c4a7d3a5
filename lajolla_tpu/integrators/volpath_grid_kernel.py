"""Fused persistent megakernel for grid-media (heterogeneous) volpath —
the hetvol class.

The general event machine (integrators/volpath.py _advance_event) runs
hetvol at ~3.6 us/lane-step in XLA — ~1000x the per-lane-step cost of
the fused surface kernel — because every outer iteration round-trips
~50 per-lane gathers and a thousand-op vertex body through HBM. This
kernel moves the WHOLE event machine into one `pallas_call`: the flat
phase machine (main cast / free flight / shadow cast / shadow flight,
volpath.py PH_*), the supervoxel-DDA majorant walk, delta tracking, the
MIS caches, NEE shadow chains through index-matching interfaces, phase
and BSDF sampling, RR, film accumulation and immediate path
regeneration — all VMEM-resident.

The blocker for fusing grid media was the per-lane trilinear density
lookup: Mosaic has no per-lane dynamic gather, and the fine grid
(hetvol: 128x128x50) is far beyond the one-hot MXU bound. Two-part
answer, both riding the MXU:

* supervoxel majorants + empty-skip (scene.svox_data, <= 512 rows by
  compile-time divisor choice) are fetched by an exact one-hot matmul
  per tracking micro-step (volpath._majorant_segment semantics);
* the fine density value at each tentative collision is an MXU
  **matmul-gather**: the mono grid is stored (Z*Y, X); the x-linear
  interpolation is dot(grid, Wx) where Wx carries each lane's two
  x-corner weights, and the (z,y)-bilinear weights contract the
  (Z*Y, B) product on the VPU. One tracking micro-step costs one
  (Z*Y, X) x (X, B) matmul — ~1.7 GMAC at B=2048 in bf16 — instead of
  an impossible gather. bf16 grid operands perturb the density field by
  ~0.4% relative (an unbiased estimator of the ROUNDED field); the
  hetvol golden + hispp bias gates bound the effect, and GRID_BF16=False
  compiles the f32/HIGHEST form for verification.

Class facts baked in (scene/compile.py meta.grid_kernel_ok +
supports()): ONE heterogeneous medium, monochrome density grid,
constant albedo — so sigma_t is a SCALAR field and the tracking
products (trans/tdp/tnp, mtp, dir-pdf MIS) collapse from rgb to mono
rows; vacuum (-1) elsewhere, index-matching interfaces switch medium by
the hit's interior/exterior ids (vol_path_tracing.h:149-163,:716-726).

Estimator semantics mirror _advance_event statement by statement (which
itself ports vol_path_tracing.h:503-869 + :299-495), same counter-hash
RNG streams ((seed, item, bounce) roots, _S_* salts, per-tracking-
iteration _uit cells). Channel draws are elided: with a scalar sigma_t
field every channel choice picks equal values, and the hash streams are
position-independent (no state advances), so eliding them changes no
other draw.

Activation: volpath + supports(meta) on TPU (render_volpath dispatch,
with permanent fallback to the general engine on compile failure).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lajolla_tpu.integrators.path_kernel import (
    _cone_pdf_area, _dot3, _eval_pdf_dispatch, _intersect, _norm3, _onb,
    _rows, _sample_dispatch, _sphere_closest, _srows, _woop_mat)
from lajolla_tpu.integrators.path_megakernel import (_pcg_hash, _primary,
                                                     _u01)
from lajolla_tpu.integrators.volpath_kernel import (_hg_row, _u)
from lajolla_tpu.scene.types import PHASE_HG as PHASE_HG_TAG

BLOCK = 2048        # lanes per program instance (state + density
                    # chunk buffers stay far under VMEM)
DC = 128            # lanes per density-matmul chunk (A buffer is
                    # (Z*Y, DC) f32 — 3.3 MB for hetvol)
K_STEPS = 2         # tracking micro-steps per kernel iteration
DENSITY_SKIP = False  # skip a density chunk's matmul when none of its
                      # 128 lanes consumes the value (lax.cond) —
                      # NEGATIVE result: the cond branches double-
                      # allocate the chunk buffers past the vmem budget
                      # (docs/PERF_LEDGER.md); keep off
WZY_FACTOR = True     # factored (z,y) contraction: reduce over y with
                      # a (Y,DC) weight, then over z — ~1 VPU op per
                      # (ZY,DC) element instead of the ~10-op Wzy
                      # construction (the dominant VPU cost). TPU-timed
                      # r5: hetvol 0.301 -> 0.454 Mpaths/s (+50%);
                      # interpret-equivalent to 5e-7
GRID_BF16 = True    # bf16 matmul-gather operands (see module docstring)
INF = float('inf')
PI = 3.141592653589793
TWO_PI = 6.283185307179586
INV_4PI = 1.0 / (4.0 * PI)
_GOLD = 0x9E3779B9
INTERPRET = False

# draw-site salts / phase ids — MUST match integrators/volpath.py
_S_FF = 0x111AA111
_S_NEE = 0x222BB222
_S_NEE_SEG = 0x333CC333
_S_PHASE = 0x444DD444
_S_BSDF = 0x555EE555
_S_RR = 0x666FF666
PH_CAST = 0
PH_FF = 1
PH_SHC = 3
PH_SHF = 4


def supports(meta):
    from lajolla_tpu.scene.types import (MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC,
                                         PHASE_HG, PHASE_ISOTROPIC)
    kernel_mats = {MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC}
    return (meta.grid_kernel_ok and
            not meta.svox_ctrl and
            set(meta.mat_types_present) <= kernel_mats and
            set(meta.phase_types_present) <= {PHASE_ISOTROPIC, PHASE_HG} and
            len(meta.phase_types_present) == 1 and
            not meta.has_envmap and
            not meta.needs_uv and
            not meta.use_bvh and
            meta.num_triangles >= 1 and
            meta.num_lights >= 1 and
            meta.camera_medium_id in (-1, 0))


def _uit(hs, it, k):
    """k-th uniform of (traced) inner-loop iteration it, row form
    (volpath.py _uit)."""
    hsi = _pcg_hash(hs ^ _pcg_hash(it.astype(jnp.uint32) +
                                   jnp.uint32(0x9E377969)))
    return _u(hsi, k + 1)


def _slab_hit(o, d, tfar, pmin, pmax):
    """Grid-AABB slab test, (1,B) bool (media.volume_aabb_hit_vrow with
    static box)."""
    t0 = None
    t1 = None
    for ax in range(3):
        sd = jnp.where(jnp.abs(d[ax:ax + 1]) > 1e-20, d[ax:ax + 1], 1e-20)
        tn = (pmin[ax] - o[ax:ax + 1]) / sd
        tf = (pmax[ax] - o[ax:ax + 1]) / sd
        lo = jnp.minimum(tn, tf)
        hi = jnp.maximum(tn, tf)
        t0 = lo if t0 is None else jnp.maximum(t0, lo)
        t1 = hi if t1 is None else jnp.minimum(t1, hi)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, tfar)
    return t0 <= t1


def _svox_segment(o, d, t_cur, t_hit, svox2, *, pmin, pmax, gres, R):
    """Mono port of volpath._majorant_segment (DDA step over the
    supervoxel majorant grid + empty-skip): returns (maj (1,B),
    t_end (1,B)). svox2: (2, R) f32 [majorant | skip] columns; the
    fetch is an exact one-hot HIGHEST matmul."""
    gx, gy, gz = gres
    sd = [jnp.where(jnp.abs(d[a:a + 1]) > 1e-20, d[a:a + 1], 1e-20)
          for a in range(3)]
    t0 = None
    t1 = None
    for ax in range(3):
        tn = (pmin[ax] - o[ax:ax + 1]) / sd[ax]
        tf = (pmax[ax] - o[ax:ax + 1]) / sd[ax]
        lo = jnp.minimum(tn, tf)
        hi = jnp.maximum(tn, tf)
        t0 = lo if t0 is None else jnp.maximum(t0, lo)
        t1 = hi if t1 is None else jnp.minimum(t1, hi)
    t0 = jnp.maximum(t0, 0.0)
    span = jnp.maximum(t1 - t0, 1e-20)
    tq = t_cur + 1e-5 * span
    gresf = (float(gx), float(gy), float(gz))
    cell = []
    clo = []
    chi = []
    for ax in range(3):
        pn = (o[ax:ax + 1] + d[ax:ax + 1] * tq - pmin[ax]) / \
            max(pmax[ax] - pmin[ax], 1e-20)
        c = jnp.clip((pn * gresf[ax]).astype(jnp.int32), 0,
                     gres[ax] - 1)
        cell.append(c)
        cf = c.astype(jnp.float32)
        clo.append(pmin[ax] + cf / gresf[ax] * (pmax[ax] - pmin[ax]))
        chi.append(pmin[ax] + (cf + 1.0) / gresf[ax] *
                   (pmax[ax] - pmin[ax]))
    idx = (cell[2] * gy + cell[1]) * gx + cell[0]          # (1,B)
    iota = jax.lax.broadcasted_iota(jnp.int32, (R,) + idx.shape[1:],
                                    0).reshape(R, -1)
    oh = (iota == jnp.broadcast_to(idx, (R, idx.shape[1]))
          ).astype(jnp.float32)
    rowd = jax.lax.dot_general(svox2, oh, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)
    maj_cell = rowd[0:1]
    skip = rowd[1:2]
    t_exit = None
    for ax in range(3):
        ex = jnp.maximum(skip - 1.0, 0.0) / gresf[ax] * \
            (pmax[ax] - pmin[ax])
        tcn = (clo[ax] - ex - o[ax:ax + 1]) / sd[ax]
        tcf = (chi[ax] + ex - o[ax:ax + 1]) / sd[ax]
        hi = jnp.maximum(tcn, tcf)
        t_exit = hi if t_exit is None else jnp.minimum(t_exit, hi)
    before = t_cur < t0
    after = t_cur >= t1
    outside = before | after | (t0 > t1)
    maj = jnp.where(outside, 0.0, maj_cell)
    t_end = jnp.where(before & (t0 <= t1), t0,
                      jnp.where(after | (t0 > t1), INF,
                                jnp.maximum(t_exit, tq)))
    return maj, jnp.minimum(t_end, t_hit)


def _density(p, grid, zidx, yidx, act=None, *, pmin, pmax, res, B):
    """Trilinear mono density at p (3,B) -> (1,B) via MXU matmul-gather.
    grid: (Z*Y, X); zidx/yidx: (Z*Y, 1) i32 row coordinates (host
    constants — Mosaic-safe replacement for iota//Y). Zero outside the
    box (volume.h:45-52). act (1,B) bool: lanes whose value is consumed
    this micro-step — with DENSITY_SKIP, a chunk with no active lane
    skips its matmul via lax.cond (the per-instance straggler tail runs
    the full iteration body for a handful of live lanes; this makes
    idle-chunk iterations cheap)."""
    X, Y, Z = res
    fr = []
    i0 = []
    i1 = []
    inside = None
    n_ax = (X, Y, Z)
    for ax in range(3):
        pn = (p[ax:ax + 1] - pmin[ax]) / max(pmax[ax] - pmin[ax], 1e-20)
        ins = (pn >= 0.0) & (pn <= 1.0)
        inside = ins if inside is None else (inside & ins)
        f = pn * float(n_ax[ax] - 1)
        c0 = jnp.clip(f.astype(jnp.int32), 0, n_ax[ax] - 1)
        fr.append(f - c0.astype(jnp.float32))
        i0.append(c0)
        i1.append(jnp.minimum(c0 + 1, n_ax[ax] - 1))
    ZY = grid.shape[0]
    gdt = jnp.bfloat16 if GRID_BF16 else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if GRID_BF16
            else jax.lax.Precision.HIGHEST)
    gcast = grid.astype(gdt)
    chunks = []
    iox = jax.lax.broadcasted_iota(jnp.int32, (X, DC), 0)
    for c in range(B // DC):
        sl = slice(c * DC, (c + 1) * DC)

        def _chunk(sl=sl):
            return _density_chunk(i0, i1, fr, gcast, zidx, yidx, iox,
                                  sl, gdt, prec, X=X, ZY=ZY, Y_=Y)
        if DENSITY_SKIP and act is not None:
            chunks.append(jax.lax.cond(jnp.any(act[:, sl]), _chunk,
                                       lambda: jnp.zeros((1, DC),
                                                         jnp.float32)))
        else:
            chunks.append(_chunk())
    val = jnp.concatenate(chunks, axis=1)
    return jnp.where(inside, jnp.maximum(val, 0.0), 0.0)


def _density_chunk(i0, i1, fr, gcast, zidx, yidx, iox, sl, gdt, prec,
                   *, X, ZY, Y_):
        x0 = jnp.broadcast_to(i0[0][:, sl], (X, DC))
        x1 = jnp.broadcast_to(i1[0][:, sl], (X, DC))
        dx = jnp.broadcast_to(fr[0][:, sl], (X, DC))
        Wx = jnp.where(iox == x0, 1.0 - dx, 0.0) + \
            jnp.where(iox == x1, dx, 0.0)
        A = jax.lax.dot_general(gcast, Wx.astype(gdt),
                                (((1,), (0,)), ((), ())),
                                precision=prec,
                                preferred_element_type=jnp.float32)
        if WZY_FACTOR:
            Z = ZY // Y_
            ioy = jax.lax.broadcasted_iota(jnp.int32, (Y_, DC), 0)
            Wy = jnp.where(ioy == jnp.broadcast_to(i0[1][:, sl],
                                                   (Y_, DC)),
                           1.0 - jnp.broadcast_to(fr[1][:, sl],
                                                  (Y_, DC)), 0.0) + \
                jnp.where(ioy == jnp.broadcast_to(i1[1][:, sl],
                                                  (Y_, DC)),
                          jnp.broadcast_to(fr[1][:, sl], (Y_, DC)), 0.0)
            ioz = jax.lax.broadcasted_iota(jnp.int32, (Z, DC), 0)
            Wz = jnp.where(ioz == jnp.broadcast_to(i0[2][:, sl],
                                                   (Z, DC)),
                           1.0 - jnp.broadcast_to(fr[2][:, sl],
                                                  (Z, DC)), 0.0) + \
                jnp.where(ioz == jnp.broadcast_to(i1[2][:, sl],
                                                  (Z, DC)),
                          jnp.broadcast_to(fr[2][:, sl], (Z, DC)), 0.0)
            A3 = A.reshape(Z, Y_, DC)
            B1 = jnp.sum(A3 * Wy[None, :, :], axis=1)      # (Z, DC)
            return jnp.sum(B1 * Wz, axis=0, keepdims=True)
        z0 = jnp.broadcast_to(i0[2][:, sl], (ZY, DC))
        z1 = jnp.broadcast_to(i1[2][:, sl], (ZY, DC))
        dz = jnp.broadcast_to(fr[2][:, sl], (ZY, DC))
        y0 = jnp.broadcast_to(i0[1][:, sl], (ZY, DC))
        y1 = jnp.broadcast_to(i1[1][:, sl], (ZY, DC))
        dy = jnp.broadcast_to(fr[1][:, sl], (ZY, DC))
        zb = jnp.broadcast_to(zidx, (ZY, DC))
        yb = jnp.broadcast_to(yidx, (ZY, DC))
        Wzy = (jnp.where(zb == z0, 1.0 - dz, 0.0) +
               jnp.where(zb == z1, dz, 0.0)) * \
              (jnp.where(yb == y0, 1.0 - dy, 0.0) +
               jnp.where(yb == y1, dy, 0.0))
        return jnp.sum(A * Wzy, axis=0, keepdims=True)


def _ff_micro(go, wsc, forg, fdir, f_thit, hs, st, grid, zidx, yidx,
              svox2, *, pmin, pmax, gres, res, R, B, max_null):
    """ONE delta/ratio-tracking micro-step, mono (volpath._ff_steps.step
    with control == 0 and a scalar sigma_t field). The extra rho_sc
    carry latches the density at the accepted real collision — the
    vertex's get_sigma_s(new_org) re-evaluation for free
    (vol_path_tracing.h:736-739)."""
    (accum_t, it, trans, tdp, tnp, scatter, dn, rho_sc) = st
    live = go & ~dn & (it < max_null)
    maj, t_end = _svox_segment(forg, fdir, accum_t, f_thit, svox2,
                               pmin=pmin, pmax=pmax, gres=gres, R=R)
    u0 = _uit(hs, it, 0)
    u1 = _uit(hs, it, 1)
    t = jnp.where(maj > 0,
                  -jnp.log(jnp.maximum(1.0 - u0, 1e-20)) /
                  jnp.maximum(maj, 1e-20), INF)
    dt = t_end - accum_t
    t_next = jnp.minimum(accum_t + t, t_end)
    in_flight = t < dt
    hit_end = ~in_flight & (t_end >= f_thit)
    p = jnp.concatenate([forg[0:1] + fdir[0:1] * t_next,
                         forg[1:2] + fdir[1:2] * t_next,
                         forg[2:3] + fdir[2:3] * t_next], axis=0)
    rho = _density(p, grid, zidx, yidx, act=live & in_flight,
                   pmin=pmin, pmax=pmax, res=res, B=B)
    maxden = jnp.maximum(maj, 1e-20)
    sigma_n = maj * (1.0 - rho / maxden)
    real_prob = rho / maxden
    att = jnp.exp(-maj * jnp.minimum(t, 1e30))
    att_dt = jnp.exp(-maj * jnp.minimum(dt, 1e30))
    is_real = wsc & (u1 < real_prob)
    trans_n = jnp.where(
        in_flight,
        jnp.where(is_real, trans * att / maxden,
                  trans * att * sigma_n / maxden),
        trans * att_dt)
    tdp_n = jnp.where(
        in_flight,
        jnp.where(is_real, tdp * att * maj * real_prob / maxden,
                  tdp * att * maj * (1.0 - real_prob) / maxden),
        tdp * att_dt)
    tnp_n = jnp.where(
        in_flight,
        jnp.where(is_real, tnp, tnp * att * maj / maxden),
        tnp * att_dt)
    scatter_n = scatter | (in_flight & is_real)
    dn_n = dn | hit_end | (in_flight & is_real) | \
        (~wsc & (trans_n <= 0)) | (it + 1 >= max_null)
    rho_n = jnp.where(scatter_n & ~scatter, rho, rho_sc)
    sel = lambda a, b: jnp.where(live, a, b)
    # Mosaic cannot select between i1 operands (548dc6a hazard class):
    # flag updates use logical algebra instead of jnp.where
    return (sel(t_next, accum_t), sel(it + 1, it), sel(trans_n, trans),
            sel(tdp_n, tdp), sel(tnp_n, tnp),
            (live & scatter_n) | (~live & scatter),
            (live & dn_n) | (~live & dn), sel(rho_n, rho_sc))


def _advance_grid_core(st, hb, W, tri, triA, triB, qf, light, stair, sph,
                       grid, zidx, yidx, svox2,
                       *, T: int, TC: int, L: int, S: int, mats: tuple,
                       has_quads: bool, hg: bool, g1: float,
                       albedo: tuple, maxval: float,
                       pmin: tuple, pmax: tuple, res: tuple, gres: tuple,
                       R: int, B: int, max_null: int,
                       eps_isect: float, eps_shadow: float,
                       max_depth: int, rr_depth: int, max_cap: int):
    """One event-machine step, row form — a statement-by-statement
    mirror of volpath._advance_event with the grid-class facts folded
    in (see module docstring). st excludes item/done/film (driver
    rows). Returns (new_st, died)."""
    (bounces, org, d, med, Tt, Ll, dir_pdf, nee_p, mtp, ph,
     ff_hs, ff_t, ff_it, ff_tr, ff_dp, ff_np, ff_sc, ff_dn, ff_rho,
     sh_p, sh_dir, sh_med, sh_seg, sh_T, sh_pn, sh_pd, lp_pos,
     nb_hs, cb, pdfb, pdfd, tsc,
     sg_t, sg_valid, sg_opaque, sg_dblock, sg_mednext,
     v_alive, done) = st
    # flag rows are carried as i32 (Mosaic rejects i8->i1 truncations
    # of carried bool vectors — same hazard class as the quad-flag
    # selects); convert to bool at entry, back to i32 at pack
    ff_sc = ff_sc > 0
    ff_dn = ff_dn > 0
    sg_valid = sg_valid > 0
    sg_opaque = sg_opaque > 0
    sg_dblock = sg_dblock > 0
    v_alive = v_alive > 0
    done = done > 0
    one1 = jnp.ones_like(ff_t)
    zero1 = jnp.zeros_like(ff_t)
    ones3 = jnp.ones_like(Tt)
    zeros3 = jnp.zeros_like(Tt)
    alive_l = ~done

    in_cast = alive_l & (ph == PH_CAST)
    in_ff = alive_l & (ph == PH_FF)
    in_shc = alive_l & (ph == PH_SHC)
    in_shf = alive_l & (ph == PH_SHF)
    is_sh = in_shc | in_shf
    in_medium = med >= 0

    if not has_quads:
        qf = None

    # ---- unified raw cast: main ray (CAST/FF re-derives its t_hit —
    # deterministic, so no mc_* cache rows) or shadow segment (SHC) ----
    dlpx = lp_pos[0:1] - sh_p[0:1]
    dlpy = lp_pos[1:2] - sh_p[1:2]
    dlpz = lp_pos[2:3] - sh_p[2:3]
    dist_l = jnp.sqrt(jnp.maximum(
        dlpx * dlpx + dlpy * dlpy + dlpz * dlpz, 1e-20))
    shc_f = in_shc
    co = jnp.where(jnp.broadcast_to(shc_f, sh_p.shape), sh_p, org)
    cd = jnp.where(jnp.broadcast_to(shc_f, sh_dir.shape), sh_dir, d)
    cnear = jnp.where(shc_f, eps_shadow, eps_isect)
    cfar = jnp.where(shc_f, (1.0 - eps_shadow) * dist_l, 1e30)
    t_tri, sel, ub, vb, qb = _intersect(co, cd, cnear, cfar, W, TC, qf)
    if S:
        t_sph, ssel = _sphere_closest(co, cd, cnear, sph, S)
        t_sph = jnp.where(t_sph < cfar, t_sph, INF)
        sph_win = t_sph < t_tri
        t_hit = jnp.minimum(t_tri, t_sph)
        srows = _srows(ssel, sph)
    else:
        sph_win = jnp.zeros_like(t_tri) > 0
        t_hit = t_tri
    valid = t_hit < INF
    self_f = sel.astype(jnp.float32)
    if has_quads:
        back = (qb > 0.0) & (ub + vb > 1.0)
        rows = jnp.where(back, _rows(self_f, triB), _rows(self_f, triA))
        ub, vb = (jnp.where(back, 1.0 - vb, ub),
                  jnp.where(back, ub + vb - 1.0, vb))
    else:
        rows = _rows(self_f, triA)

    # hit point (main-lane vertex position OR shadow-interface point)
    hx = co[0:1] + t_hit * cd[0:1]
    hy = co[1:2] + t_hit * cd[1:2]
    hz = co[2:3] + t_hit * cd[2:3]

    # geometric + shading normals (volpath_kernel._advance_vol_core)
    ngx = rows[4:5] * rows[8:9] - rows[5:6] * rows[7:8]
    ngy = rows[5:6] * rows[6:7] - rows[3:4] * rows[8:9]
    ngz = rows[3:4] * rows[7:8] - rows[4:5] * rows[6:7]
    ngx, ngy, ngz = _norm3(ngx, ngy, ngz)
    wbw = 1.0 - ub - vb
    snx = wbw * rows[9:10] + ub * rows[12:13] + vb * rows[15:16]
    sny = wbw * rows[10:11] + ub * rows[13:14] + vb * rows[16:17]
    snz = wbw * rows[11:12] + ub * rows[14:15] + vb * rows[17:18]
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
        inv_r = 1.0 / jnp.maximum(srows[3:4], 1e-20)
        sngx = (hx - srows[0:1]) * inv_r
        sngy = (hy - srows[1:2]) * inv_r
        sngz = (hz - srows[2:3]) * inv_r
        sngx, sngy, sngz = _norm3(sngx, sngy, sngz)
        ngx = jnp.where(sph_win, sngx, ngx)
        ngy = jnp.where(sph_win, sngy, ngy)
        ngz = jnp.where(sph_win, sngz, ngz)
        snx = jnp.where(sph_win, sngx, snx)
        sny = jnp.where(sph_win, sngy, sny)
        snz = jnp.where(sph_win, sngz, snz)

    def pick(tri_row, sph_row):
        return jnp.where(sph_win, sph_row, tri_row) if S else tri_row
    h_light = pick(rows[19:20], srows[4:5] if S else None)
    le_r = pick(rows[23:24], srows[15:16] if S else None)
    le_g = pick(rows[24:25], srows[16:17] if S else None)
    le_b = pick(rows[25:26], srows[17:18] if S else None)
    h_pmf = pick(rows[27:28], srows[14:15] if S else None)
    h_inv_area = pick(rows[26:27], srows[14:15] * 0.0 if S else None)
    kd = (pick(rows[20:21], srows[6:7] if S else None),
          pick(rows[21:22], srows[7:8] if S else None),
          pick(rows[22:23], srows[8:9] if S else None))
    mat_ok = pick(rows[34:35], srows[18:19] if S else None) > 0
    int_med = pick(rows[35:36], srows[19:20] if S else None
                   ).astype(jnp.int32)
    ext_med = pick(rows[36:37], srows[20:21] if S else None
                   ).astype(jnp.int32)
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

    # update_medium from THIS hit (vol_path_tracing.h:149-163)
    differs = int_med != ext_med
    going_out = _dot3(cd[0:1], cd[1:2], cd[2:3], ngx, ngy, ngz) > 0
    med_cross = jnp.where(differs,
                          jnp.where(going_out, ext_med, int_med),
                          jnp.where(shc_f, sh_med, med))

    # ---- main free-flight init (PH_CAST) ------------------------------
    hs_ff0 = _pcg_hash(hb + jnp.uint32(_S_FF))
    t_hit_main = jnp.where(valid, t_hit, INF)
    maj0_ok = _slab_hit(org, d, t_hit_main, pmin, pmax)
    ff_trivial = (med < 0) | ~maj0_ok | (maxval <= 0)

    # ---- shadow-segment setup (PH_SHC) --------------------------------
    sg_valid_n = valid
    seg_next_t = jnp.where(sg_valid_n, t_hit, dist_l)
    sg_opaque_n = sg_valid_n & mat_ok
    if max_depth != -1:
        sg_dblock_n = sg_valid_n & \
            ((bounces - 1 + sh_seg + 1) >= max_depth)
    else:
        sg_dblock_n = sg_valid_n & (zero1 > 1.0)
    sg_mednext_n = jnp.where(differs,
                             jnp.where(going_out, ext_med, int_med),
                             sh_med)
    sg_t = jnp.where(in_shc, seg_next_t, sg_t)
    sg_valid = (in_shc & sg_valid_n) | (~in_shc & sg_valid)
    sg_opaque = (in_shc & sg_opaque_n) | (~in_shc & sg_opaque)
    sg_dblock = (in_shc & sg_dblock_n) | (~in_shc & sg_dblock)
    sg_mednext = jnp.where(in_shc, sg_mednext_n, sg_mednext)
    hseg = _pcg_hash(nb_hs ^ _pcg_hash(
        sh_seg.astype(jnp.uint32) + jnp.uint32(_S_NEE_SEG)))
    smaj0_ok = _slab_hit(sh_p, sh_dir, seg_next_t, pmin, pmax)
    sff_trivial = (sh_med < 0) | ~smaj0_ok | (maxval <= 0)

    # reset ff state on entry
    entry = in_cast | in_shc
    ff_hs = jnp.where(in_cast, hs_ff0, jnp.where(in_shc, hseg, ff_hs))
    ff_t = jnp.where(entry, 0.0, ff_t)
    ff_it = jnp.where(entry, 0, ff_it)
    ff_tr = jnp.where(entry, 1.0, ff_tr)
    ff_dp = jnp.where(entry, 1.0, ff_dp)
    ff_np = jnp.where(entry, 1.0, ff_np)
    # flag selects as logical algebra (no i1-operand jnp.where)
    ff_sc = ff_sc & ~entry
    ff_dn = (in_cast & ff_trivial) | (in_shc & sff_trivial) | \
        (~entry & ff_dn)

    # ---- K bounded tracking micro-steps (all four phases) -------------
    shb = jnp.broadcast_to(is_sh, sh_p.shape)
    f_org = jnp.where(shb, sh_p, org)
    f_dir = jnp.where(shb, sh_dir, d)
    f_thit = jnp.where(is_sh, sg_t, t_hit_main)
    go = in_cast | in_ff | is_sh
    wsc = ~is_sh & in_medium
    fst = (ff_t, ff_it, ff_tr, ff_dp, ff_np, ff_sc, ff_dn, ff_rho)
    for _k in range(K_STEPS):
        fst = _ff_micro(go, wsc, f_org, f_dir, f_thit, ff_hs, fst,
                        grid, zidx, yidx, svox2, pmin=pmin, pmax=pmax,
                        gres=gres, res=res, R=R, B=B, max_null=max_null)
    (ff_t, ff_it, ff_tr, ff_dp, ff_np, ff_sc, ff_dn, ff_rho) = fst

    ph = jnp.where((in_cast | in_ff) & ~ff_dn, PH_FF, ph)
    seg_ff_done = is_sh & ff_dn
    ph = jnp.where(is_sh & ~ff_dn, PH_SHF, ph)

    # ---- shadow-segment wrap-up ---------------------------------------
    has_med_seg = sh_med >= 0
    sh_T = jnp.where(seg_ff_done & has_med_seg, sh_T * ff_tr, sh_T)
    sh_pn = jnp.where(seg_ff_done & has_med_seg, sh_pn * ff_np, sh_pn)
    sh_pd = jnp.where(seg_ff_done & has_med_seg, sh_pd * ff_dp, sh_pd)
    blocked = sg_opaque | sg_dblock
    cont_chain = seg_ff_done & sg_valid & ~blocked & (sh_seg + 1 < 16)
    sh_med = jnp.where(cont_chain, sg_mednext, sh_med)
    adv = jnp.broadcast_to(cont_chain, sh_p.shape)
    sh_p = jnp.where(adv, sh_p + sg_t * sh_dir, sh_p)
    sh_seg = jnp.where(seg_ff_done, sh_seg + 1, sh_seg)
    ph = jnp.where(cont_chain, PH_SHC, ph)
    chain_done = seg_ff_done & ~cont_chain

    # ---- NEE completion (vol_path_tracing.h:299-495 products) ---------
    ok = ~blocked & (sh_T > 0)
    pdf_nee = pdfb * sh_pn
    contrib = sh_T * cb / jnp.maximum(pdf_nee, 1e-30)
    pdf_dir3 = pdfd * sh_pd
    wmis = (pdf_nee * pdf_nee) / jnp.maximum(
        pdf_nee * pdf_nee + pdf_dir3 * pdf_dir3, 1e-30)
    nee_out = jnp.where(jnp.broadcast_to(ok, cb.shape),
                        contrib * wmis, zeros3)
    cdb = jnp.broadcast_to(chain_done, cb.shape)
    Ll = Ll + jnp.where(cdb, tsc * nee_out, zeros3)
    nee_gain = (jnp.maximum(jnp.maximum(nee_out[0:1], nee_out[1:2]),
                            nee_out[2:3]) > 0)
    nee_p = jnp.where(jnp.broadcast_to(chain_done & nee_gain,
                                       nee_p.shape), org, nee_p)
    cont_ok = v_alive & (bounces < max_cap)
    died_c = chain_done & ~cont_ok
    ph = jnp.where(chain_done & cont_ok, PH_CAST, ph)

    # ---- VERTEX (runs the iteration the main free flight ends) --------
    vready = (in_cast | in_ff) & ff_dn
    active = vready
    trans = jnp.where(in_medium, ff_tr, one1)
    tdp = jnp.where(in_medium, ff_dp, one1)
    tnp_v = jnp.where(in_medium, ff_np, one1)
    scatter = ff_sc & in_medium
    mtp_v = jnp.where(in_medium, mtp * tdp, mtp)

    vacuum_miss = ~in_medium & ~valid
    Ll = jnp.where(jnp.broadcast_to(active & vacuum_miss, Ll.shape),
                   zeros3, Ll)
    active = active & ~vacuum_miss

    scb = jnp.broadcast_to(scatter, org.shape)
    sc_pos = org + d * ff_t
    hpos = jnp.concatenate([hx, hy, hz], axis=0)
    vb3 = jnp.broadcast_to(valid, org.shape)
    new_org = jnp.where(scb, sc_pos, jnp.where(vb3, hpos, org))
    T_v = Tt * (trans / jnp.maximum(tdp, 1e-30))

    wix, wiy, wiz = -d[0:1], -d[1:2], -d[2:3]

    # emission + MIS vs the cached NEE origin (:652-711)
    hit_light = active & ~scatter & valid & (h_light >= 0)
    one_sided = _dot3(ngx, ngy, ngz, wix, wiy, wiz) > 0
    le_r = jnp.where(one_sided, le_r, 0.0)
    le_g = jnp.where(one_sided, le_g, 0.0)
    le_b = jnp.where(one_sided, le_b, 0.0)
    dpx = hx - nee_p[0:1]
    dpy = hy - nee_p[1:2]
    dpz = hz - nee_p[2:3]
    dist2p = jnp.maximum(dpx * dpx + dpy * dpy + dpz * dpz, 1e-20)
    jac_e = jnp.maximum(_dot3(d[0:1], d[1:2], d[2:3], ngx, ngy, ngz),
                        0.0) / dist2p
    p1e = h_pmf * h_inv_area * tnp_v
    if S:
        npv = (nee_p[0:1], nee_p[1:2], nee_p[2:3])
        p1e_s = h_pmf * _cone_pdf_area(
            (srows[0:1], srows[1:2], srows[2:3]), srows[3:4], npv,
            (hx, hy, hz), (ngx, ngy, ngz),
            (d[0:1], d[1:2], d[2:3]), dist2p) * tnp_v
        p1e = jnp.where(sph_win, p1e_s, p1e)
    p2e = dir_pdf * mtp_v * jac_e
    w_l = (p2e * p2e) / jnp.maximum(p2e * p2e + p1e * p1e, 1e-30)
    first = bounces == 0
    w_l = jnp.where(first, 1.0, w_l)
    add = jnp.where(hit_light, w_l, 0.0)
    Ll = Ll + T_v * jnp.concatenate([le_r, le_g, le_b], axis=0) * add
    active = active & ~(hit_light & first)

    # index-matching pass-through (:716-726)
    pass_through = active & ~scatter & valid & ~mat_ok
    medium_pt = med_cross        # main-lane crossing of THIS hit

    if max_depth != -1:
        depth_stop = bounces >= (max_depth - 1)
    else:
        depth_stop = zero1 > 1.0
    active_work = active & ~pass_through & ~depth_stop
    active = active & ~(depth_stop & ~pass_through)
    active = active & (scatter | valid)

    do_scatter = active_work & scatter
    do_surface = active_work & ~scatter & valid
    sigma_s3 = jnp.concatenate([albedo[0] * ff_rho, albedo[1] * ff_rho,
                                albedo[2] * ff_rho], axis=0)

    # phase sampling (:737-784)
    hph = _pcg_hash(hb + jnp.uint32(_S_PHASE))
    up0 = _u(hph, 0)
    up1 = _u(hph, 1)
    zp = 1.0 - 2.0 * up0
    rp = jnp.sqrt(jnp.maximum(0.0, 1.0 - zp * zp))
    php = TWO_PI * up1
    pdx = rp * jnp.cos(php)
    pdy = rp * jnp.sin(php)
    pdz = zp
    if hg:
        g_safe = g1 if abs(g1) >= 1e-3 else 1.0
        if abs(g1) < 1e-3:
            ph_pdf = INV_4PI * one1
        else:
            tmp = (g_safe * g_safe - 1.0) / \
                (2.0 * up0 * g_safe - (g_safe + 1.0))
            cos_el = (tmp * tmp - (1.0 + g_safe * g_safe)) / \
                (2.0 * g_safe)
            sin_el = jnp.sqrt(jnp.maximum(1.0 - cos_el * cos_el, 0.0))
            az = TWO_PI * up1
            ptx, pty, ptz, pbx, pby, pbz = _onb(wix, wiy, wiz)
            sc_ = sin_el * jnp.cos(az)
            ssn = sin_el * jnp.sin(az)
            pdx = sc_ * ptx + ssn * pbx + cos_el * wix
            pdy = sc_ * pty + ssn * pby + cos_el * wiy
            pdz = sc_ * ptz + ssn * pbz + cos_el * wiz
            ph_pdf = _hg_row(g1, _dot3(wix, wiy, wiz, pdx, pdy, pdz))
        thr_sc = T_v * (ph_pdf / jnp.maximum(ph_pdf, 1e-30)) * sigma_s3
    else:
        ph_pdf = INV_4PI * one1
        thr_sc = T_v * sigma_s3

    # surface interaction (:786-848); no transmissive mats in the class
    flip_f = _dot3(snx, sny, snz, wix, wiy, wiz) < 0
    fn = (jnp.where(flip_f, -snx, snx), jnp.where(flip_f, -sny, sny),
          jnp.where(flip_f, -snz, snz))
    ng = (ngx, ngy, ngz)
    wi = (wix, wiy, wiz)
    hbs = _pcg_hash(hb + jnp.uint32(_S_BSDF))
    ub0 = _u(hbs, 0)
    ub1 = _u(hbs, 1)
    ub2 = _u(hbs, 2)
    dir_out, samp_valid = _sample_dispatch(mats, mt, wi, fn, ng, kd, ks,
                                           rough, ub0, ub1, ub2)
    f2, p2s = _eval_pdf_dispatch(mats, mt, wi, dir_out, fn, ng, kd, ks,
                                 rough, eta)
    bsdf_ok = samp_valid & (p2s > 0)
    active = active & ~(do_surface & ~bsdf_ok)
    thr_sf = T_v * jnp.concatenate(list(f2), axis=0) / \
        jnp.maximum(p2s, 1e-30)

    # NEE setup: light pick + point + direction-independent factors
    with_nee = do_scatter | do_surface
    hb_eff = jnp.where(do_surface, _pcg_hash(hb + jnp.uint32(7)), hb)
    nb_hs_v = _pcg_hash(hb_eff + jnp.uint32(_S_NEE))
    un0 = _u(nb_hs_v, 0)
    un1 = _u(nb_hs_v, 1)
    un2 = _u(nb_hs_v, 2)
    un3 = _u(nb_hs_v, 3)
    lcdf_col = light[0:1, :].T
    lsel_idx = jnp.sum((lcdf_col < un2).astype(jnp.float32),
                       axis=0, keepdims=True)
    lsel_idx = jnp.minimum(lsel_idx, float(L - 1)).astype(jnp.int32)
    liota = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    lsel = (liota == lsel_idx).astype(jnp.float32)
    lrow = _rows(lsel, light)
    l_pmf = lrow[1:2]
    l_int_r, l_int_g, l_int_b = lrow[2:3], lrow[3:4], lrow[4:5]
    l_inv_area = lrow[5:6]
    l_shape = lrow[6:7]
    key = l_shape + un3
    tsel_idx = jnp.sum((stair.T < key).astype(jnp.float32), axis=0,
                       keepdims=True)
    tsel_idx = jnp.minimum(tsel_idx, float(T - 1)).astype(jnp.int32)
    tiota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    tsel = (tiota == tsel_idx).astype(jnp.float32)
    lt = _rows(tsel, tri)
    a_s = jnp.sqrt(jnp.clip(un0, 0.0, 1.0))
    b1_ = 1.0 - a_s
    b2_ = a_s * un1
    lpx = lt[0:1] + b1_ * lt[3:4] + b2_ * lt[6:7]
    lpy = lt[1:2] + b1_ * lt[4:5] + b2_ * lt[7:8]
    lpz = lt[2:3] + b1_ * lt[5:6] + b2_ * lt[8:9]
    lnx = lt[4:5] * lt[8:9] - lt[5:6] * lt[7:8]
    lny = lt[5:6] * lt[6:7] - lt[3:4] * lt[8:9]
    lnz = lt[3:4] * lt[7:8] - lt[4:5] * lt[6:7]
    lnx, lny, lnz = _norm3(lnx, lny, lnz)
    p1_area = l_inv_area
    if S:
        is_sl = lrow[7:8] > 0
        lcx, lcy, lcz = lrow[8:9], lrow[9:10], lrow[10:11]
        lr = lrow[11:12]
        dcx_ = lcx - new_org[0:1]
        dcy_ = lcy - new_org[1:2]
        dcz_ = lcz - new_org[2:3]
        d2c = jnp.maximum(dcx_ * dcx_ + dcy_ * dcy_ + dcz_ * dcz_, 1e-20)
        inside_s = d2c < lr * lr
        zu = 1.0 - 2.0 * un0
        ru = jnp.sqrt(jnp.maximum(0.0, 1.0 - zu * zu))
        phiu = TWO_PI * un1
        n_in = (ru * jnp.cos(phiu), ru * jnp.sin(phiu), zu)
        tcx, tcy, tcz = _norm3(dcx_, dcy_, dcz_)
        ftx, fty, ftz, fbx, fby, fbz = _onb(tcx, tcy, tcz)
        sin_el_max_sq = lr * lr / d2c
        cos_el_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_el_max_sq))
        cos_el2 = (1.0 - un0) + un0 * cos_el_max
        sin_el2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_el2 * cos_el2))
        azim = TWO_PI * un1
        dcn = jnp.sqrt(d2c)
        ds = dcn * cos_el2 - jnp.sqrt(jnp.maximum(
            0.0, lr * lr - dcn * dcn * sin_el2 * sin_el2))
        cos_a = (dcn * dcn + lr * lr - ds * ds) / jnp.maximum(
            2.0 * dcn * lr, 1e-20)
        sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
        ca = jnp.cos(azim)
        sa_ = jnp.sin(azim)
        n_out = (-(sin_a * ca * ftx + sin_a * sa_ * fbx + cos_a * tcx),
                 -(sin_a * ca * fty + sin_a * sa_ * fby + cos_a * tcy),
                 -(sin_a * ca * ftz + sin_a * sa_ * fbz + cos_a * tcz))
        lnsx = jnp.where(inside_s, n_in[0], n_out[0])
        lnsy = jnp.where(inside_s, n_in[1], n_out[1])
        lnsz = jnp.where(inside_s, n_in[2], n_out[2])
        lpx = jnp.where(is_sl, lcx + lr * lnsx, lpx)
        lpy = jnp.where(is_sl, lcy + lr * lnsy, lpy)
        lpz = jnp.where(is_sl, lcz + lr * lnsz, lpz)
        lnx = jnp.where(is_sl, lnsx, lnx)
        lny = jnp.where(is_sl, lnsy, lny)
        lnz = jnp.where(is_sl, lnsz, lnz)

    dlx = lpx - new_org[0:1]
    dly = lpy - new_org[1:2]
    dlz = lpz - new_org[2:3]
    dist2 = jnp.maximum(dlx * dlx + dly * dly + dlz * dlz, 1e-20)
    dlx, dly, dlz = _norm3(dlx, dly, dlz)
    if S:
        p1_sph = _cone_pdf_area(
            (lcx, lcy, lcz), lr,
            (new_org[0:1], new_org[1:2], new_org[2:3]),
            (lpx, lpy, lpz), (lnx, lny, lnz), (dlx, dly, dlz), dist2)
        p1_area = jnp.where(is_sl, p1_sph, p1_area)

    jac_n = jnp.maximum(-_dot3(dlx, dly, dlz, lnx, lny, lnz),
                        0.0) / dist2
    le3 = jnp.concatenate([l_int_r, l_int_g, l_int_b], axis=0)
    Le_ok = -_dot3(dlx, dly, dlz, lnx, lny, lnz) > 0
    le3 = jnp.where(jnp.broadcast_to(Le_ok, le3.shape), le3, zeros3)
    pdfb_v = l_pmf * p1_area
    f_bs, pdf_bs = _eval_pdf_dispatch(mats, mt, wi, (dlx, dly, dlz),
                                      fn, ng, kd, ks, rough, eta)
    if hg and abs(g1) >= 1e-3:
        ph_nee = _hg_row(g1, _dot3(wix, wiy, wiz, dlx, dly, dlz))
    else:
        ph_nee = INV_4PI * one1
    dsb = jnp.broadcast_to(do_surface, le3.shape)
    f_sel = jnp.concatenate(
        [jnp.where(do_surface, jnp.where(pdf_bs > 0, f_bs[0], 0.0),
                   ph_nee),
         jnp.where(do_surface, jnp.where(pdf_bs > 0, f_bs[1], 0.0),
                   ph_nee),
         jnp.where(do_surface, jnp.where(pdf_bs > 0, f_bs[2], 0.0),
                   ph_nee)], axis=0)
    cb_v = f_sel * le3 * jac_n
    pdfd_v = jnp.where(do_surface, pdf_bs, ph_nee) * jac_n
    tsc_v = jnp.where(jnp.broadcast_to(do_scatter, T_v.shape),
                      T_v * sigma_s3, T_v)

    # merge continuation
    d_next = jnp.where(scb & jnp.broadcast_to(do_scatter, d.shape),
                       jnp.concatenate([pdx, pdy, pdz], axis=0), d)
    d_next = jnp.where(jnp.broadcast_to(do_surface, d.shape),
                       jnp.concatenate(list(dir_out), axis=0), d_next)
    T_n = jnp.where(jnp.broadcast_to(do_scatter, T_v.shape), thr_sc,
                    jnp.where(jnp.broadcast_to(do_surface, T_v.shape),
                              thr_sf, T_v))
    medium_n = jnp.where(pass_through, medium_pt, med)
    dir_pdf_n = jnp.where(do_scatter, ph_pdf, dir_pdf)
    mtp_n = jnp.where(do_scatter, one1, mtp_v)

    # russian roulette (:851-862); eta_scale == 1 in the class
    do_rr = (bounces >= rr_depth) & active & ~pass_through
    T_max = jnp.maximum(jnp.maximum(T_n[0:1], T_n[1:2]), T_n[2:3])
    rr_prob = jnp.where(do_rr, jnp.minimum(T_max, 0.95), 1.0)
    u_rr = _u(_pcg_hash(hb + jnp.uint32(_S_RR)), 0)
    active = active & ~(do_rr & (u_rr > rr_prob))
    T_n = jnp.where(jnp.broadcast_to(do_rr, T_n.shape),
                    T_n / jnp.maximum(rr_prob, 1e-20), T_n)

    # ---- apply vertex results -----------------------------------------
    v = vready
    v3 = jnp.broadcast_to(v, org.shape)
    med_vertex = med
    org = jnp.where(v3, new_org, org)
    d = jnp.where(v3, d_next, d)
    Tt = jnp.where(v3, T_n, Tt)
    med = jnp.where(v, medium_n, med)
    bounces = jnp.where(v, bounces + 1, bounces)
    dir_pdf = jnp.where(v, dir_pdf_n, dir_pdf)
    mtp = jnp.where(v, mtp_n, mtp)
    v_alive = (v & active) | (~v & v_alive)

    start_chain = v & with_nee
    s3 = jnp.broadcast_to(start_chain, org.shape)
    sh_p = jnp.where(s3, new_org, sh_p)
    sh_dir = jnp.where(s3, jnp.concatenate([dlx, dly, dlz], axis=0),
                       sh_dir)
    sh_med = jnp.where(start_chain, med_vertex, sh_med)
    sh_seg = jnp.where(start_chain, 0, sh_seg)
    sh_T = jnp.where(start_chain, 1.0, sh_T)
    sh_pn = jnp.where(start_chain, 1.0, sh_pn)
    sh_pd = jnp.where(start_chain, 1.0, sh_pd)
    lp_pos = jnp.where(s3, jnp.concatenate([lpx, lpy, lpz], axis=0),
                       lp_pos)
    nb_hs = jnp.where(start_chain, nb_hs_v, nb_hs)
    cb = jnp.where(s3, cb_v, cb)
    pdfb = jnp.where(start_chain, pdfb_v, pdfb)
    pdfd = jnp.where(start_chain, pdfd_v, pdfd)
    tsc = jnp.where(s3, tsc_v, tsc)
    ph = jnp.where(start_chain, PH_SHC, ph)

    cont_now = v & ~with_nee & active
    ph = jnp.where(cont_now, PH_CAST, ph)
    died_v = v & ~with_nee & ~active

    died = (died_v | died_c) & ~done
    i32 = lambda x: x.astype(jnp.int32)
    nst = (bounces, org, d, med, Tt, Ll, dir_pdf, nee_p, mtp, ph,
           ff_hs, ff_t, ff_it, ff_tr, ff_dp, ff_np, i32(ff_sc),
           i32(ff_dn), ff_rho,
           sh_p, sh_dir, sh_med, sh_seg, sh_T, sh_pn, sh_pd, lp_pos,
           nb_hs, cb, pdfb, pdfd, tsc,
           sg_t, i32(sg_valid), i32(sg_opaque), i32(sg_dblock),
           sg_mednext, i32(v_alive), i32(done))
    return nst, died


# ---------------------------------------------------------------------------
# Persistent kernel + host wrapper (structure of volpath_kernel.py)
# ---------------------------------------------------------------------------

def _kernel(su_ref, s0_ref, cam_ref,
            woop_ref, tri_ref, triA_ref, triB_ref, qf_ref,
            light_ref, stair_ref, sph_ref, svox_ref,
            grid_ref, zidx_ref, yidx_ref,
            film_o, *, n, n_real, w, h, nspp, filter_type,
            filter_param, **statics):
    su = su_ref[0]
    s0 = s0_ref[0]
    pid = pl.program_id(0)
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) +
            pid * BLOCK)
    px = (lane % w).astype(jnp.float32)
    py = (lane // w).astype(jnp.float32)
    cam = cam_ref
    woop = woop_ref[:]
    tri = tri_ref[:]
    triA = triA_ref[:]
    triB = triB_ref[:]
    qf = qf_ref[:]
    light = light_ref[:]
    stair = stair_ref[:]
    sph = sph_ref[:]
    svox2 = svox_ref[:]
    grid = grid_ref[:]
    zidx = zidx_ref[:]
    yidx = yidx_ref[:]
    cam_med = statics.pop('cam_med_static')

    prim = functools.partial(_primary, px=px, py=py, su=su, cam=cam,
                             w=w, h=h, filter_type=filter_type,
                             filter_param=filter_param)
    item0 = lane + s0 * n
    end = (s0 + nspp) * n
    org0, d0 = prim(item0)
    # film-padding lanes (pixel >= n_real when n isn't a BLOCK
    # multiple) start done and stay inert; their film rows are dropped
    # by the wrapper. Work-item strides use the PADDED n, so RNG cells
    # differ from the engine's only when padding is active.
    done0 = (lane >= n_real).astype(jnp.int32)
    z1 = jnp.zeros((1, BLOCK), jnp.float32)
    z3 = jnp.zeros((3, BLOCK), jnp.float32)
    zi = jnp.zeros((1, BLOCK), jnp.int32)
    zu = jnp.zeros((1, BLOCK), jnp.uint32)
    zb = z1 > 1.0
    one1 = jnp.ones((1, BLOCK), jnp.float32)
    ones3 = jnp.ones((3, BLOCK), jnp.float32)

    def fresh(item, org, dd):
        # volpath._render_volpath_block `fresh`, row form (no mc rows:
        # the kernel re-derives the main cast each iteration)
        # flag rows carried as i32 (Mosaic i8->i1 truncation hazard)
        return (zi, org, dd, jnp.full((1, BLOCK), cam_med, jnp.int32),
                ones3, z3, z1, org, one1,
                jnp.full((1, BLOCK), PH_CAST, jnp.int32),
                zu, z1, zi, one1, one1, one1, zi, zi, z1,
                org, dd, zi, zi, one1, one1, one1, org,
                zu, z3, z1, z1, ones3,
                z1, zi, zi, zi, zi,
                zi, zi)

    st0 = fresh(item0, org0, d0)
    carry0 = (item0, done0, st0, z3)

    def cond(carry):
        return jnp.min(carry[1]) < 1

    def body(carry):
        item, done_i, st, film = carry
        bounces = st[0]
        hb = _pcg_hash(jax.lax.bitcast_convert_type(item, jnp.uint32) ^
                       _pcg_hash(jax.lax.bitcast_convert_type(
                           bounces, jnp.uint32) ^ su))
        st_in = st[:-1] + (done_i,)
        nst, died = _advance_grid_core(
            st_in, hb, woop, tri, triA, triB, qf, light, stair, sph,
            grid, zidx, yidx, svox2, **statics)
        L = nst[5]
        fin = jnp.all(jnp.isfinite(L), axis=0, keepdims=True)
        film = film + jnp.where(jnp.broadcast_to(died & fin, L.shape),
                                L, 0.0)
        next_item = item + n
        has_more = next_item < end
        regen = died & has_more
        done_i = jnp.maximum(done_i, (died & ~has_more).astype(jnp.int32))
        rorg, rd = prim(next_item)
        fr = fresh(next_item, rorg, rd)
        merged = []
        for f_i, cur in zip(fr[:-1], nst[:-1]):
            if cur.shape[0] == 3:
                merged.append(jnp.where(jnp.broadcast_to(regen, cur.shape),
                                        f_i, cur))
            else:
                merged.append(jnp.where(regen, f_i, cur))
        merged.append(nst[-1])          # done row (driver-managed)
        return (jnp.where(regen, next_item, item), done_i,
                tuple(merged), film)

    final = jax.lax.while_loop(cond, body, carry0)
    film_o[:] = final[3]


def render_fused_grid(scene, options, seed, s0, nspp):
    """Render nspp samples/pixel (sample indices s0..s0+nspp) of the
    full film in ONE persistent kernel launch; returns the film SUM
    (h, w, 3). Requires supports(scene.meta); the lane pool pads n up
    to a BLOCK multiple (padding lanes start done)."""
    from lajolla_tpu.dtypes import intersection_eps, shadow_eps
    from lajolla_tpu.integrators.media import (MT_ALOOK, MT_DLOOK, MT_G,
                                               MT_MAXVAL, MT_SOFF,
                                               MT_SRES, VL_CONST,
                                               VL_PMIN, VL_PMAX, VL_RES)
    from lajolla_tpu.integrators.volpath import MAX_BOUNCES_CAP
    w, h = scene.meta.width, scene.meta.height
    n = w * h
    n_q = -(-n // BLOCK) * BLOCK
    T = scene.fp_tri.shape[1]
    L = scene.fp_light.shape[1]
    S = scene.meta.num_spheres
    TC = scene.fp_woop.shape[0]
    su_a = _pcg_hash(jnp.uint32(seed) ^ jnp.uint32(0x701A77E5)).reshape(1)
    s0_a = jnp.asarray(s0, jnp.int32).reshape(1)
    cam = jnp.concatenate([scene.sample_to_cam.reshape(-1),
                           scene.cam_to_world.reshape(-1)]).astype(
                               jnp.float32)
    mrow = np.asarray(scene.med_tab[0])
    pmin = tuple(float(v) for v in mrow[MT_DLOOK + VL_PMIN:
                                        MT_DLOOK + VL_PMIN + 3])
    pmax = tuple(float(v) for v in mrow[MT_DLOOK + VL_PMAX:
                                        MT_DLOOK + VL_PMAX + 3])
    res = tuple(int(v) for v in mrow[MT_DLOOK + VL_RES:
                                     MT_DLOOK + VL_RES + 3])
    gres = tuple(int(v) for v in mrow[MT_SRES:MT_SRES + 3])
    soff = int(mrow[MT_SOFF])
    R = gres[0] * gres[1] * gres[2]
    maxval = float(mrow[MT_MAXVAL])
    albedo = tuple(float(v) for v in mrow[MT_ALOOK + VL_CONST:
                                          MT_ALOOK + VL_CONST + 3])
    g1 = float(mrow[MT_G])
    svox_np = np.asarray(scene.svox_data)[soff:soff + R]
    svox2 = jnp.asarray(svox_np[:, [0, 3]].T.copy(), jnp.float32)
    ZY = res[2] * res[1]
    assert scene.fp_grid.shape == (ZY, res[0]), \
        (scene.fp_grid.shape, res)
    zidx = jnp.asarray((np.arange(ZY) // res[1])[:, None], jnp.int32)
    yidx = jnp.asarray((np.arange(ZY) % res[1])[:, None], jnp.int32)
    grid = scene.fp_grid.astype(jnp.bfloat16 if GRID_BF16
                                else jnp.float32)

    statics = dict(
        T=T, TC=TC, L=L, S=S,
        mats=scene.meta.mat_types_present,
        has_quads=scene.meta.has_quads,
        hg=scene.meta.phase_types_present == (PHASE_HG_TAG,),
        g1=g1, albedo=albedo, maxval=maxval,
        pmin=pmin, pmax=pmax, res=res, gres=gres, R=R, B=BLOCK,
        max_null=int(options.max_null_collisions),
        eps_isect=intersection_eps(scene.meta.scene_radius),
        eps_shadow=shadow_eps(scene.meta.scene_radius),
        max_depth=options.max_depth, rr_depth=options.rr_depth,
        max_cap=MAX_BOUNCES_CAP,
        cam_med_static=int(scene.meta.camera_medium_id))
    kern = functools.partial(
        _kernel, n=n_q, n_real=n, w=w, h=h, nspp=nspp,
        filter_type=options.filter_type,
        filter_param=options.filter_param, **statics)
    full = lambda i: (0, 0)
    tab = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.VMEM)
    film = pl.pallas_call(
        kern,
        grid=(n_q // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  tab((3 * TC, 4)), tab((40, T)),
                  tab((40, TC)), tab((40, TC)), tab((TC, 1)),
                  tab((16, L)), tab((1, T)), tab((max(S, 1), 24)),
                  tab((2, R)),
                  tab((ZY, res[0])), tab((ZY, 1)), tab((ZY, 1))],
        out_specs=pl.BlockSpec((3, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_q), jnp.float32),
        interpret=INTERPRET,
        # the density matmul-gather keeps a (Z*Y, DC) product + its
        # weight temporaries live per chunk — over the 16 MB default
        # scoped-vmem budget; v5e VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(su_a, s0_a, cam, _woop_mat(scene.fp_woop), scene.fp_tri,
      scene.fp_tri[:, scene.cast_src], scene.fp_tri[:, scene.cast_alt],
      scene.cast_quad[:, None], scene.fp_light,
      scene.tri_stair_cdf[None, :], scene.fp_sph, svox2,
      grid, zidx, yidx)
    return film[:, :n].T.reshape(h, w, 3)
