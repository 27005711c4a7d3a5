"""Fused persistent megakernel for the uniform-homogeneous-medium class.

The vol_cbox workload (scenes/volpath_test/vol_cbox.xml) is the cbox
geometry submerged in ONE homogeneous medium bound to the camera and to
every shape exterior — the medium id can never change along a path, the
free flight is closed-form, and the NEE transmittance is an exact
exponential (control == sigma_t residual ratio tracking,
integrators/volpath.py _free_flight). That makes the scene class
exactly as fusable as the surface fast path: this kernel moves the
ENTIRE persistent-wavefront loop of the final volumetric integrator
(vol_path_tracing.h:503-869) into one `pallas_call`, like
path_megakernel.py does for path_tracing.h — camera sampling,
closest hit, closed-form free flight, emissive-hit MIS with the
cached-NEE-origin pdf, merged NEE (shadow any-hit + analytic
transmittance), isotropic phase / BSDF sampling, Russian roulette,
film accumulation and immediate path regeneration, all in VMEM.

Estimator semantics are the general homogeneous engine's
(integrators/volpath.py _advance_vol_lane), same counter-hash RNG
cells ((seed, item, bounce) root + the _S_* draw-site salts), with
the statically-true facts of the class folded in:

* medium id == camera medium forever (update_medium is the identity:
  no transmissive materials, exterior == camera medium, no interior);
* homogeneous closed-form free flight: majorant == sigma_t, so the
  tracking loop is ONE step — real collision (scatter) or reached the
  surface — and real_prob == 1 for any channel with sigma_t > 0;
* NEE transmittance pdf tnp == 1 and the per-segment walk is ONE
  segment (all-opaque geometry blocks or reaches the light — the
  MAX_SHADOW_SEGMENTS loop of _vol_nee never iterates);
* replicated fork quirks (volpath.py module docstring): bounce-0
  emissive hits terminate the path, the surface-bounce branch does not
  refresh dir_pdf / multi_trans_pdf (vol_path_tracing.h:785-848).

Media scenes keep the FULL occluder table (scene/compile.py): scatter
points can lie outside the geometry hull (the vol_cbox camera medium
extends behind the camera), so the convex-envelope subset of the
surface kernel is unsound here.

Activation: volpath + supports(meta) (uniform_medium, in-switch
materials, isotropic phase, area lights, no envmap/textures/BVH) on
TPU with lane pool == film (render_volpath dispatch).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lajolla_tpu.integrators.path_kernel import (
    _cone_pdf_area, _dot3, _eval_pdf_dispatch, _intersect, _norm3,
    _occluded, _onb, _rows, _sample_dispatch, _sphere_anyhit,
    _sphere_closest, _srows, _woop_mat)
from lajolla_tpu.integrators.path_megakernel import (_pcg_hash, _primary,
                                                     _u01)

from lajolla_tpu.scene.types import PHASE_HG as PHASE_HG_TAG

BLOCK = 4096
INF = float('inf')
PI = 3.141592653589793
TWO_PI = 6.283185307179586
INV_4PI = 1.0 / (4.0 * PI)
_GOLD = 0x9E3779B9
INTERPRET = False   # True = Pallas interpreter mode on CPU
                    # (tests/test_vol_kernel.py)

# draw-site salts — MUST match integrators/volpath.py
_S_FF = 0x111AA111
_S_NEE = 0x222BB222
_S_NEE_SEG = 0x333CC333
_S_PHASE = 0x444DD444
_S_BSDF = 0x555EE555
_S_RR = 0x666FF666
_IT0 = 0x9E377969   # volpath._uit inner-iteration mixer (it == 0 here)


def supports(meta):
    from lajolla_tpu.scene.types import (MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC,
                                         PHASE_HG, PHASE_ISOTROPIC)
    kernel_mats = {MAT_LAMBERTIAN, MAT_ROUGH_PLASTIC}
    return (meta.uniform_medium and
            set(meta.mat_types_present) <= kernel_mats and
            len(meta.mat_types_present) >= 1 and
            set(meta.phase_types_present) <= {PHASE_ISOTROPIC, PHASE_HG} and
            len(meta.phase_types_present) == 1 and
            not meta.has_envmap and
            not meta.needs_uv and
            not meta.use_bvh and
            meta.num_triangles >= 1 and
            meta.num_lights >= 1)


# ---------------------------------------------------------------------------
# volpath.py counter-stream helpers in (1, B) row form
# ---------------------------------------------------------------------------

def _u(hs, dim):
    """dim-th U[0,1) of the sub-stream rooted at (1,B) uint32 hs
    (volpath.py _u)."""
    return _u01(_pcg_hash(hs + jnp.uint32(dim * _GOLD & 0xFFFFFFFF)))


def _uit0(hs, k):
    """k-th uniform of inner-loop iteration 0 (volpath.py _uit)."""
    hsi = _pcg_hash(hs ^ _pcg_hash(jnp.uint32(_IT0)))
    return _u(hsi, k + 1)


def _pick_ch(ch, v3):
    """(1,B) int32 channel -> per-lane component of a (3,B) vector."""
    return jnp.where(ch == 0, v3[0:1],
                     jnp.where(ch == 1, v3[1:2], v3[2:3]))


def _hg_row(g, c):
    """Henyey-Greenstein lobe (media._hg / henyeygreenstein.inl). The
    engine computes the 1.5 power as `** 1.5`; t*sqrt(t) is the same
    quantity on constructs Mosaic compiles (ulp-level divergence only,
    absorbed by the statistical HG parity gate)."""
    t = jnp.maximum(1.0 + g * g + 2.0 * g * c, 1e-20)
    return INV_4PI * (1.0 - g * g) / jnp.maximum(t * jnp.sqrt(t), 1e-20)


def _avg3(v3):
    # explicit slice form (not jnp.mean): same fp result as the general
    # engine's jnp.mean on (3,) — sum then divide — while staying on
    # constructs the surface kernels already compile through Mosaic
    return (v3[0:1] + v3[1:2] + v3[2:3]) / 3.0


def _max3(v3):
    return jnp.maximum(jnp.maximum(v3[0:1], v3[1:2]), v3[2:3])


# ---------------------------------------------------------------------------
# One path-vertex advance of the final volumetric integrator, row form.
# Mirrors integrators/volpath.py _advance_vol_lane statement by statement
# (which itself mirrors vol_path_tracing.h:503-869); see module docstring
# for the statically-resolved branches.
# ---------------------------------------------------------------------------

def _advance_vol_core(o, d, thr, rad, bounces, dir_pdf, mtp, nee_p, act_in,
                      hb, sa3, ss3, g1,
                      W, W_occ, tri, triA, triB, qf, qf_occ, light, stair,
                      sph,
                      *, T: int, TC: int, T_OCC: int, L: int, S: int,
                      mats: tuple, has_quads: bool, hg: bool,
                      eps_isect: float, eps_shadow: float,
                      max_depth: int, rr_depth: int, max_cap: int):
    """o,d,thr,rad,mtp,nee_p: (3,B); bounces: (1,B) i32; dir_pdf: (1,B);
    act_in: (1,B) bool; hb: (1,B) uint32 per-(item,bounce) stream root;
    sa3/ss3: (3,B) medium sigma_a/sigma_s; g1: scalar HG asymmetry
    (used when the static `hg` says the single medium's phase is HG).
    Returns (org', d', thr', rad', dir_pdf', mtp', nee_p', alive)."""
    st3 = sa3 + ss3                                       # sigma_t
    max_maj = jnp.maximum(_max3(st3), 1e-20)              # (1,B)
    ones3 = jnp.ones_like(thr)

    if not has_quads:
        qf = qf_occ = None

    # ---- closest hit (triangles + spheres), as path_kernel._advance_core
    t_tri, sel, ub, vb, qb = _intersect(o, d, eps_isect, None, W, TC, qf)
    if S:
        t_sph, ssel = _sphere_closest(o, d, eps_isect, sph, S)
        sph_win = t_sph < t_tri
        t_hit = jnp.minimum(t_tri, t_sph)
        srows = _srows(ssel, sph)
    else:
        sph_win = jnp.zeros_like(t_tri) > 0
        t_hit = t_tri
    valid = t_hit < INF                                   # (1,B)
    self_f = sel.astype(jnp.float32)
    if has_quads:
        back = (qb > 0.0) & (ub + vb > 1.0)
        rows = jnp.where(back, _rows(self_f, triB), _rows(self_f, triA))
        ub, vb = (jnp.where(back, 1.0 - vb, ub),
                  jnp.where(back, ub + vb - 1.0, vb))
    else:
        rows = _rows(self_f, triA)

    # ---- closed-form homogeneous free flight (volpath._free_flight with
    # majorant == control == sigma_t: ONE unrolled tracking step) --------
    hs_ff = _pcg_hash(hb + jnp.uint32(_S_FF))
    ch = jnp.clip((_u(hs_ff, 0) * 3.0).astype(jnp.int32), 0, 2)
    st_ch = _pick_ch(ch, st3)
    guard = st_ch > 0.0                  # maj0_ch > 0 loop guard
    u0 = _uit0(hs_ff, 0)
    u1 = _uit0(hs_ff, 1)
    t_s = jnp.where(guard,
                    -jnp.log(jnp.maximum(1.0 - u0, 1e-20)) /
                    jnp.maximum(st_ch, 1e-20), INF)
    in_flight = t_s < t_hit              # t_hit may be +inf (open box)
    # real_prob == sigma_t/max(sigma_t, eps) per channel; the sampled
    # channel has real_prob 1 wherever guard holds, so u1 < 1 is always
    # a real collision — kept in formula form for exactness with the
    # general engine's masked algebra
    real_ch = st_ch / jnp.maximum(st_ch, 1e-20)
    is_real = u1 < real_ch
    scatter = guard & in_flight & is_real
    t_cl = jnp.minimum(jnp.where(in_flight, t_s, t_hit), 1e30)
    att = jnp.exp(-st3 * t_cl)           # (3,B): exp(-sigma_t * advance)
    # trans/tdp of the single step (sigma_n == 0, tnp == 1 — see module
    # docstring); outside the guard the loop never ran: both stay 1
    trans = jnp.where(guard,
                      jnp.where(in_flight, att / max_maj, att), ones3)
    tdp = jnp.where(guard,
                    jnp.where(in_flight, att * st3 * real_ch / max_maj,
                              att), ones3)
    mtp = mtp * tdp                      # in_medium always (class fact)

    # position advance + throughput (volpath:909-914)
    t_adv = jnp.where(scatter, t_cl, jnp.where(valid, t_hit, 0.0))
    px = o[0:1] + t_adv * d[0:1]
    py = o[1:2] + t_adv * d[1:2]
    pz = o[2:3] + t_adv * d[2:3]
    thr = thr * trans / jnp.maximum(_avg3(tdp), 1e-30)
    active = act_in
    # vacuum-miss discard (:634-641) is unreachable: in_medium always

    # ---- hit shading data (normals, material/light rows) ----------------
    ngx = rows[4:5] * rows[8:9] - rows[5:6] * rows[7:8]
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

    wix, wiy, wiz = -d[0:1], -d[1:2], -d[2:3]

    # ---- emissive hit + MIS with the cached NEE-origin pdf (:652-711) ---
    hit_light = active & ~scatter & valid & (h_light >= 0)
    one_sided = _dot3(ngx, ngy, ngz, wix, wiy, wiz) > 0
    le_r = jnp.where(one_sided, le_r, 0.0)
    le_g = jnp.where(one_sided, le_g, 0.0)
    le_b = jnp.where(one_sided, le_b, 0.0)
    dpx = px - nee_p[0:1]
    dpy = py - nee_p[1:2]
    dpz = pz - nee_p[2:3]
    dist2p = jnp.maximum(dpx * dpx + dpy * dpy + dpz * dpz, 1e-20)
    jac_e = jnp.maximum(_dot3(d[0:1], d[1:2], d[2:3], ngx, ngy, ngz),
                        0.0) / dist2p
    p1e = h_pmf * h_inv_area                           # tnp == 1
    if S:
        npv = (nee_p[0:1], nee_p[1:2], nee_p[2:3])
        p1e_s = h_pmf * _cone_pdf_area(
            (srows[0:1], srows[1:2], srows[2:3]), srows[3:4], npv,
            (px, py, pz), (ngx, ngy, ngz),
            (d[0:1], d[1:2], d[2:3]), dist2p)
        p1e = jnp.where(sph_win, p1e_s, p1e)
    p2e = dir_pdf * mtp * jac_e                        # (3,B) channel MIS
    w_l = (p2e * p2e) / jnp.maximum(p2e * p2e + p1e * p1e, 1e-30)
    first = bounces == 0
    w_l = jnp.where(first, 1.0, w_l)
    add = jnp.where(hit_light, w_l, 0.0)
    rad = rad + thr * jnp.concatenate([le_r, le_g, le_b], axis=0) * add
    # fork quirk: a bounce-0 emissive hit returns immediately (:668)
    active = active & ~(hit_light & first)

    # index-matching pass-through (:716-726) is unreachable: all-opaque
    if max_depth != -1:
        depth_stop = bounces >= (max_depth - 1)
        active_work = active & ~depth_stop
        active = active & ~depth_stop
    else:
        active_work = active
    active = active & (scatter | valid)

    do_scatter = active_work & scatter
    do_surface = active_work & ~scatter & valid

    # ---- merged NEE (volpath._vol_nee; ONE shadow segment, tnp == 1,
    # analytic exp(-sigma_t d) transmittance) -----------------------------
    hb_eff = jnp.where(do_surface, _pcg_hash(hb + jnp.uint32(7)), hb)
    hs_n = _pcg_hash(hb_eff + jnp.uint32(_S_NEE))
    un0 = _u(hs_n, 0)
    un1 = _u(hs_n, 1)
    un2 = _u(hs_n, 2)
    un3 = _u(hs_n, 3)
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
    b1 = 1.0 - a_s
    b2 = a_s * un1
    lpx = lt[0:1] + b1 * lt[3:4] + b2 * lt[6:7]
    lpy = lt[1:2] + b1 * lt[4:5] + b2 * lt[7:8]
    lpz = lt[2:3] + b1 * lt[5:6] + b2 * lt[8:9]
    lnx = lt[4:5] * lt[8:9] - lt[5:6] * lt[7:8]
    lny = lt[5:6] * lt[6:7] - lt[3:4] * lt[8:9]
    lnz = lt[3:4] * lt[7:8] - lt[4:5] * lt[6:7]
    lnx, lny, lnz = _norm3(lnx, lny, lnz)
    p1_area = l_inv_area
    if S:
        is_sl = lrow[7:8] > 0
        lcx, lcy, lcz = lrow[8:9], lrow[9:10], lrow[10:11]
        lr = lrow[11:12]
        dcx_ = lcx - px
        dcy_ = lcy - py
        dcz_ = lcz - pz
        d2c = jnp.maximum(dcx_ * dcx_ + dcy_ * dcy_ + dcz_ * dcz_, 1e-20)
        inside = d2c < lr * lr
        zu = 1.0 - 2.0 * un0
        ru = jnp.sqrt(jnp.maximum(0.0, 1.0 - zu * zu))
        phiu = TWO_PI * un1
        n_in = (ru * jnp.cos(phiu), ru * jnp.sin(phiu), zu)
        tcx, tcy, tcz = _norm3(dcx_, dcy_, dcz_)
        ftx, fty, ftz, fbx, fby, fbz = _onb(tcx, tcy, tcz)
        sin_el_max_sq = lr * lr / d2c
        cos_el_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_el_max_sq))
        cos_el = (1.0 - un0) + un0 * cos_el_max
        sin_el = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_el * cos_el))
        azim = TWO_PI * un1
        dc = jnp.sqrt(d2c)
        ds = dc * cos_el - jnp.sqrt(jnp.maximum(
            0.0, lr * lr - dc * dc * sin_el * sin_el))
        cos_a = (dc * dc + lr * lr - ds * ds) / jnp.maximum(
            2.0 * dc * lr, 1e-20)
        sin_a = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_a * cos_a))
        ca = jnp.cos(azim)
        sa_ = jnp.sin(azim)
        n_out = (-(sin_a * ca * ftx + sin_a * sa_ * fbx + cos_a * tcx),
                 -(sin_a * ca * fty + sin_a * sa_ * fby + cos_a * tcy),
                 -(sin_a * ca * ftz + sin_a * sa_ * fbz + cos_a * tcz))
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
    occ = _occluded(sh_o, sh_d, eps_shadow, sh_far, W_occ, T_OCC, qf_occ)
    if S:
        occ = occ | _sphere_anyhit(sh_o, sh_d, eps_shadow, sh_far, sph, S)

    # shadow-segment free flight (with_scatter=False, control==sigma_t):
    # residual rate 0 — the segment deterministically reaches its end
    # with trans = pd = exp(-sigma_t d), pn = 1, UNLESS the segment's own
    # sampled channel has sigma_t == 0, in which case the loop guard
    # fails and all three stay 1 (volpath._free_flight maj0_ch gate)
    hseg = _pcg_hash(hs_n ^ _pcg_hash(jnp.uint32(_S_NEE_SEG)))
    seg_ch = jnp.clip((_u(hseg, 0) * 3.0).astype(jnp.int32), 0, 2)
    seg_guard = _pick_ch(seg_ch, st3) > 0.0
    # blocked lanes never contribute, so only the reached-light distance
    # matters for the transmittance
    att_l = jnp.exp(-st3 * dist)
    Tl = jnp.where(seg_guard, att_l, ones3)
    pd_t = Tl                                           # trans_dir_pdf
    ok = ~occ & (_max3(Tl) > 0)

    jac = jnp.maximum(-_dot3(dlx, dly, dlz, lnx, lny, lnz), 0.0) / dist2
    Le_ok = -_dot3(dlx, dly, dlz, lnx, lny, lnz) > 0
    pdf_nee = l_pmf * p1_area                           # · pn == 1
    flip_f = _dot3(snx, sny, snz, wix, wiy, wiz) < 0
    fn = (jnp.where(flip_f, -snx, snx), jnp.where(flip_f, -sny, sny),
          jnp.where(flip_f, -snz, snz))
    ng = (ngx, ngy, ngz)
    wi = (wix, wiy, wiz)
    f_b, pdf_b_sa = _eval_pdf_dispatch(mats, mt, wi, (dlx, dly, dlz),
                                       fn, ng, kd, ks, rough, eta)
    ok = ok & (~do_surface | (pdf_b_sa > 0))
    # phase factors: f == pdf for both in-kernel phases (isotropic
    # 1/4pi; HG evaluates the lobe at dot(dir_view, dir_light))
    if hg:
        ph_nee = _hg_row(g1, _dot3(wix, wiy, wiz, dlx, dly, dlz))
    else:
        ph_nee = INV_4PI
    f_nee = (jnp.where(do_surface, f_b[0], ph_nee),
             jnp.where(do_surface, f_b[1], ph_nee),
             jnp.where(do_surface, f_b[2], ph_nee))
    pdf_dir_sa = jnp.where(do_surface, pdf_b_sa, ph_nee)
    pdf_dir = pdf_dir_sa * jac * pd_t                   # (3,B)
    le3 = jnp.concatenate([l_int_r, l_int_g, l_int_b], axis=0)
    le3 = jnp.where(Le_ok, le3, 0.0)
    f3 = jnp.concatenate(list(f_nee), axis=0)
    contrib = Tl * f3 * le3 * jac / jnp.maximum(_avg3(pdf_nee * ones3),
                                                1e-30)
    w_n = (pdf_nee * pdf_nee) / jnp.maximum(
        pdf_nee * pdf_nee + pdf_dir * pdf_dir, 1e-30)
    nee_m = jnp.where(ok, contrib * w_n, 0.0)
    ss_sel = jnp.where(do_scatter, ss3, ones3)
    rad = rad + jnp.where(do_scatter | do_surface,
                          thr * ss_sel * nee_m, 0.0)

    # ---- phase sampling (:737-784): isotropic == uniform sphere; HG ==
    # exact inverse-CDF around dir_view with the |g|<1e-3 uniform
    # fallback (media.phase_sample / henyeygreenstein.inl:26-46) -------
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
        g_safe = jnp.where(jnp.abs(g1) < 1e-3, 1.0, g1)
        tmp = (g_safe * g_safe - 1.0) / \
            (2.0 * up0 * g_safe - (g_safe + 1.0))
        cos_el = (tmp * tmp - (1.0 + g_safe * g_safe)) / (2.0 * g_safe)
        sin_el = jnp.sqrt(jnp.maximum(1.0 - cos_el * cos_el, 0.0))
        az = TWO_PI * up1
        ptx, pty, ptz, pbx, pby, pbz = _onb(wix, wiy, wiz)
        sc = sin_el * jnp.cos(az)
        ssn = sin_el * jnp.sin(az)
        hgx = sc * ptx + ssn * pbx + cos_el * wix
        hgy = sc * pty + ssn * pby + cos_el * wiy
        hgz = sc * ptz + ssn * pbz + cos_el * wiz
        use_u = jnp.abs(g1) < 1e-3
        pdx = jnp.where(use_u, pdx, hgx)
        pdy = jnp.where(use_u, pdy, hgy)
        pdz = jnp.where(use_u, pdz, hgz)
        ph_pdf = _hg_row(g1, _dot3(wix, wiy, wiz, pdx, pdy, pdz))
        # T_scatter = T · (f/pdf) · sigma_s, f == pdf (the engine form
        # keeps the clamp: hg/max(hg, 1e-30))
        thr_sc = thr * (ph_pdf / jnp.maximum(ph_pdf, 1e-30)) * ss3
    else:
        ph_pdf = INV_4PI
        # f/pdf == 1 exactly for isotropic
        thr_sc = thr * ss3

    # ---- surface interaction (:786-848) ---------------------------------
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
    # no transmissive materials in the switch set: eta_scale == 1,
    # medium unchanged (class facts)
    thr_sf = thr * jnp.concatenate(list(f2), axis=0) / \
        jnp.maximum(p2s, 1e-30)

    # nee cache (:755-760, :806-810)
    nee_valid = (do_scatter | do_surface) & (_max3(nee_m) > 0)
    pos3 = jnp.concatenate([px, py, pz], axis=0)
    nee_p = jnp.where(nee_valid, pos3, nee_p)

    # ---- merge branch results -------------------------------------------
    d_next = jnp.where(do_scatter,
                       jnp.concatenate([pdx, pdy, pdz], axis=0),
                       jnp.where(do_surface,
                                 jnp.concatenate(list(dir_out), axis=0),
                                 d))
    thr = jnp.where(do_scatter, thr_sc,
                    jnp.where(do_surface, thr_sf, thr))
    dir_pdf = jnp.where(do_scatter, ph_pdf, dir_pdf)
    mtp = jnp.where(do_scatter, ones3, mtp)

    # ---- russian roulette (:851-862) -------------------------------------
    do_rr = (bounces >= rr_depth) & active
    rr_prob = jnp.where(do_rr, jnp.minimum(_max3(thr), 0.95), 1.0)
    u_rr = _u(_pcg_hash(hb + jnp.uint32(_S_RR)), 0)
    active = active & ~(do_rr & (u_rr > rr_prob))
    thr = jnp.where(do_rr, thr / jnp.maximum(rr_prob, 1e-20), thr)

    active = active & ((bounces + 1) < max_cap)
    return pos3, d_next, thr, rad, dir_pdf, mtp, nee_p, active


# ---------------------------------------------------------------------------
# Persistent kernel + host wrapper (structure of path_megakernel.py)
# ---------------------------------------------------------------------------

def _kernel(su_ref, s0_ref, cam_ref, med_ref,
            woop_ref, woop_occ_ref, tri_ref, triA_ref, triB_ref,
            qf_ref, qfocc_ref, light_ref, stair_ref, sph_ref,
            film_o, *, n, w, h, nspp, filter_type, filter_param,
            **statics):
    su = su_ref[0]                    # pre-hashed volpath stream root
    s0 = s0_ref[0]
    pid = pl.program_id(0)
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) +
            pid * BLOCK)
    px = (lane % w).astype(jnp.float32)
    py = (lane // w).astype(jnp.float32)
    cam = cam_ref
    med = med_ref
    woop = woop_ref[:]
    woop_occ = woop_occ_ref[:]
    tri = tri_ref[:]
    triA = triA_ref[:]
    triB = triB_ref[:]
    qf = qf_ref[:]
    qf_occ = qfocc_ref[:]
    light = light_ref[:]
    stair = stair_ref[:]
    sph = sph_ref[:]
    one1 = jnp.ones((1, BLOCK), jnp.float32)
    sa3 = jnp.concatenate([med[0] * one1, med[1] * one1, med[2] * one1],
                          axis=0)
    ss3 = jnp.concatenate([med[3] * one1, med[4] * one1, med[5] * one1],
                          axis=0)

    prim = functools.partial(_primary, px=px, py=py, su=su, cam=cam,
                             w=w, h=h, filter_type=filter_type,
                             filter_param=filter_param)
    item0 = lane + s0 * n
    end = (s0 + nspp) * n
    org0, d0 = prim(item0)
    z3 = jnp.zeros((3, BLOCK), jnp.float32)
    z1 = jnp.zeros((1, BLOCK), jnp.float32)
    ones3 = jnp.ones((3, BLOCK), jnp.float32)
    state0 = (item0, jnp.zeros((1, BLOCK), jnp.int32),   # bounces
              org0, d0, ones3, z3, z1, ones3, org0,
              jnp.zeros((1, BLOCK), jnp.int32),          # done (i32)
              z3)                                        # film

    def cond(carry):
        return jnp.min(carry[9]) < 1

    def body(carry):
        (item, bounces, org, d, thr, rad, dir_pdf, mtp, nee_p, done,
         film) = carry
        act = done < 1
        hb = _pcg_hash(jax.lax.bitcast_convert_type(item, jnp.uint32) ^
                       _pcg_hash(jax.lax.bitcast_convert_type(
                           bounces, jnp.uint32) ^ su))
        org2, d2, thr2, rad2, dp2, mtp2, np2, alive = _advance_vol_core(
            org, d, thr, rad, bounces, dir_pdf, mtp, nee_p, act, hb,
            sa3, ss3, med[6], woop, woop_occ, tri, triA, triB, qf,
            qf_occ, light, stair, sph, **statics)
        died = act & ~alive
        fin = jnp.all(jnp.isfinite(rad2), axis=0, keepdims=True)
        film = film + jnp.where(died & fin, rad2, 0.0)
        next_item = item + n
        has_more = next_item < end
        regen = died & has_more
        done = jnp.maximum(done, (died & ~has_more).astype(jnp.int32))
        rorg, rd = prim(next_item)
        sel = lambda a, b: jnp.where(regen, a, b)
        return (sel(next_item, item),
                sel(jnp.zeros_like(bounces), bounces + 1),
                sel(rorg, org2), sel(rd, d2),
                sel(ones3, thr2), sel(z3, rad2),
                sel(z1, dp2), sel(ones3, mtp2), sel(rorg, np2),
                done, film)

    final = jax.lax.while_loop(cond, body, state0)
    film_o[:] = final[10]


def render_fused_vol(scene, options, seed, s0, nspp):
    """Render nspp samples/pixel (sample indices s0..s0+nspp) of the full
    film in ONE persistent kernel launch; returns the film SUM (h, w, 3).
    Requires supports(scene.meta) and n % BLOCK == 0."""
    import numpy as np
    from lajolla_tpu.dtypes import intersection_eps, shadow_eps
    from lajolla_tpu.integrators.media import MT_G, MT_SA, MT_SS
    from lajolla_tpu.integrators.volpath import MAX_BOUNCES_CAP
    w, h = scene.meta.width, scene.meta.height
    n = w * h
    assert n % BLOCK == 0
    T = scene.fp_tri.shape[1]
    L = scene.fp_light.shape[1]
    # volpath's seed pre-hash (volpath._render_volpath_block)
    su_a = _pcg_hash(jnp.uint32(seed) ^ jnp.uint32(0x701A77E5)).reshape(1)
    s0_a = jnp.asarray(s0, jnp.int32).reshape(1)
    cam = jnp.concatenate([scene.sample_to_cam.reshape(-1),
                           scene.cam_to_world.reshape(-1)]).astype(
                               jnp.float32)
    mrow = np.asarray(scene.med_tab[0])
    med = jnp.asarray(np.concatenate([mrow[MT_SA:MT_SA + 3],
                                      mrow[MT_SS:MT_SS + 3],
                                      mrow[MT_G:MT_G + 1],
                                      np.zeros(1, np.float32)]),
                      jnp.float32)
    S = scene.meta.num_spheres
    TC = scene.fp_woop.shape[0]
    T_OCC = scene.fp_woop_occ.shape[0]
    kern = functools.partial(
        _kernel, n=n, w=w, h=h, nspp=nspp,
        filter_type=options.filter_type, filter_param=options.filter_param,
        T=T, TC=TC, T_OCC=T_OCC, L=L, S=S,
        mats=scene.meta.mat_types_present,
        has_quads=scene.meta.has_quads,
        hg=scene.meta.phase_types_present == (PHASE_HG_TAG,),
        eps_isect=intersection_eps(scene.meta.scene_radius),
        eps_shadow=shadow_eps(scene.meta.scene_radius),
        max_depth=options.max_depth, rr_depth=options.rr_depth,
        max_cap=MAX_BOUNCES_CAP)
    full = lambda i: (0, 0)
    tab = lambda shape: pl.BlockSpec(shape, full, memory_space=pltpu.VMEM)
    film = pl.pallas_call(
        kern,
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  tab((3 * TC, 4)), tab((3 * T_OCC, 4)), tab((40, T)),
                  tab((40, TC)), tab((40, TC)), tab((TC, 1)),
                  tab((T_OCC, 1)),
                  tab((16, L)), tab((1, T)),
                  tab((max(S, 1), 24))],
        out_specs=pl.BlockSpec((3, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        interpret=INTERPRET,
    )(su_a, s0_a, cam, med, _woop_mat(scene.fp_woop),
      _woop_mat(scene.fp_woop_occ), scene.fp_tri,
      scene.fp_tri[:, scene.cast_src], scene.fp_tri[:, scene.cast_alt],
      scene.cast_quad[:, None], scene.cast_occ_quad[:, None],
      scene.fp_light, scene.tri_stair_cdf[None, :], scene.fp_sph)
    return film.T.reshape(h, w, 3)
