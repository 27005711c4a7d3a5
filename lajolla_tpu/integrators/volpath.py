"""Volumetric path tracer (null-scattering / delta tracking with MIS).

Faithful re-derivation of the reference's final volumetric integrator
(vol_path_tracing.h:503-869) and its NEE helper (:299-495), plus the
pedagogical versions 1 and 2 (:6-147); versions 3-5 delegate to the
final integrator exactly like the fork does (:880,:1052,:1297).

Wavefront structure (round 2 — same persistent-queue design as the
surface engine, integrators/path.py): a fixed lane pool processes
(pixel, sample) work items; each outer `lax.while_loop` iteration
advances every lane by ONE path bounce, and lanes whose path terminates
splat and immediately regenerate from the queue, so total iterations ≈
spp × E[path length] instead of spp × MAX_BOUNCES_CAP. The inner
stochastic loops — null collisions and shadow-ray segments — remain
bounded nested `lax.while_loop`s inside the bounce step. All randomness
comes from the (seed, item, bounce, salt, dim) pcg-hash counter stream
(path.py), replacing per-lane threefry chains (~10x the ALU work).

Deliberately replicated fork quirks (for output parity):
  * escaping into vacuum discards ALL accumulated radiance
    (vol_path_tracing.h:634-641 returns zero);
  * the surface-bounce branch does not refresh dir_pdf /
    multi_trans_pdf for the next emissive-hit MIS (:785-848).
"""

from functools import partial

import jax
import jax.numpy as jnp

from lajolla_tpu.core.math import (distance, distance_squared, dot,
                                   normalize)
from lajolla_tpu.dtypes import intersection_eps, shadow_eps
from lajolla_tpu.integrators.lights import (LightPoint, emission_area,
                                            light_pmf, pdf_point_on_light,
                                            sample_light,
                                            sample_point_on_light)
from lajolla_tpu.integrators.media import (get_majorant, get_sigma_a,
                                           get_sigma_s, phase_eval,
                                           phase_pdf, phase_sample,
                                           update_medium)
from lajolla_tpu.integrators.path import (_GOLD, _dense_film_add,
                                          _hash_u01, _pcg_hash,
                                          _primary_hash,
                                          _ray_diff_reflect,
                                          _ray_diff_refract)
from lajolla_tpu.materials import eval_bsdf, pdf_bsdf, sample_bsdf
from lajolla_tpu.scene.camera import sample_primary
from lajolla_tpu.scene.geometry import intersect_scene

INF = jnp.float32(jnp.inf)
MAX_BOUNCES_CAP = 64
MAX_SHADOW_SEGMENTS = 16  # index-matching interfaces along one shadow ray

# Draw-site salts for the counter-hash stream: each random-consuming site
# inside one (item, bounce) cell gets its own sub-stream.
_S_FF = 0x111AA111       # main free-flight
_S_NEE = 0x222BB222      # NEE light pick + point sample
_S_NEE_SEG = 0x333CC333  # per-shadow-segment free flight
_S_PHASE = 0x444DD444
_S_BSDF = 0x555EE555
_S_RR = 0x666FF666


def _avg(s):
    return jnp.mean(s)


def _u(hs, dim):
    """dim-th U[0,1) of the sub-stream rooted at uint32 hs."""
    return _hash_u01(_pcg_hash(hs + jnp.uint32(dim * _GOLD & 0xFFFFFFFF)))


def _uit(hs, it, k):
    """k-th uniform of (traced) inner-loop iteration it."""
    hsi = _pcg_hash(hs ^ _pcg_hash(it.astype(jnp.uint32) +
                                   jnp.uint32(0x9E377969)))
    return _u(hsi, k + 1)


def _uniforms(key, n):
    key, sub = jax.random.split(key)
    return key, jax.random.uniform(sub, (n,))


def _sigmas(scene, row, p):
    """sigma_s and sigma_a from ONE density + ONE albedo lookup (the
    separate get_sigma_s/get_sigma_a calls would do the grid trilinear
    twice each — this is the inner-loop hot spot for grid media). `row`
    is the prefetched wide medium row (media.med_row) so the inner loop
    does no medium-table gathers at all."""
    from lajolla_tpu.integrators.media import (MT_ALOOK, MT_DLOOK, MT_SA,
                                               MT_SS, MT_TYPE,
                                               lookup_volume_vrow)
    from lajolla_tpu.scene.types import MED_HETEROGENEOUS, MED_HOMOGENEOUS
    hom_s = row[MT_SS:MT_SS + 3]
    hom_a = row[MT_SA:MT_SA + 3]
    if MED_HETEROGENEOUS not in scene.meta.med_types_present:
        return hom_s, hom_a
    density = lookup_volume_vrow(scene, row[MT_DLOOK:MT_DLOOK + 14], p)
    albedo = lookup_volume_vrow(scene, row[MT_ALOOK:MT_ALOOK + 14], p)
    het_s = density * albedo
    het_a = density * (1.0 - albedo)
    is_hom = row[MT_TYPE] == MED_HOMOGENEOUS
    return (jnp.where(is_hom, hom_s, het_s),
            jnp.where(is_hom, hom_a, het_a))


# ---------------------------------------------------------------------------
# Free-flight (null-scattering) sampling through a medium segment
# (vol_path_tracing.h:554-629 main form; :355-410 NEE form)
# ---------------------------------------------------------------------------

def _majorant_segment(scene, row, org, d, t_cur, t_hit):
    """Piecewise-constant majorant along the ray: the (3,) majorant that
    bounds sigma_t over [t_cur, t_end), and t_end itself. `row` is the
    prefetched wide medium row (media.med_row).

    Homogeneous media: (sigma_a + sigma_s, t_hit) — one segment, exactly
    the reference's behavior (media/homogeneous.inl). Heterogeneous grid
    media: a DDA step over the compile-time supervoxel majorant grid
    (scene.svox_*, scene/compile.py _super_majorants) replacing the
    single global grid max the reference uses
    (media/heterogeneous.inl:3-11) — outside the grid bbox the majorant
    is 0 (density lookups are 0 there, volume.h:45-52), inside it is the
    current supervoxel's bound and t_end its exit distance."""
    from lajolla_tpu.integrators.media import (MT_DLOOK, MT_SA, MT_SOFF,
                                               MT_SRES, MT_SS, MT_TYPE,
                                               VL_PMIN, VL_PMAX)
    from lajolla_tpu.scene.types import MED_HETEROGENEOUS
    hom = row[MT_SA:MT_SA + 3] + row[MT_SS:MT_SS + 3]
    if MED_HETEROGENEOUS not in scene.meta.med_types_present:
        return hom, t_hit

    pmin = row[MT_DLOOK + VL_PMIN:MT_DLOOK + VL_PMIN + 3]
    pmax = row[MT_DLOOK + VL_PMAX:MT_DLOOK + VL_PMAX + 3]
    sres = row[MT_SRES:MT_SRES + 3].astype(jnp.int32)      # (3,) i32
    sresf = row[MT_SRES:MT_SRES + 3]
    safe_d = jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    tn = (pmin - org) / safe_d
    tf = (pmax - org) / safe_d
    t0 = jnp.maximum(jnp.max(jnp.minimum(tn, tf)), 0.0)
    t1 = jnp.min(jnp.maximum(tn, tf))

    # current supervoxel (nudged off the entry boundary)
    span = jnp.maximum(t1 - t0, 1e-20)
    tq = t_cur + 1e-5 * span
    pn = (org + d * tq - pmin) / jnp.maximum(pmax - pmin, 1e-20)
    cell = jnp.clip((pn * sresf).astype(jnp.int32), 0, sres - 1)
    clo = pmin + cell.astype(jnp.float32) / sresf * (pmax - pmin)
    chi = pmin + (cell + 1).astype(jnp.float32) / sresf * (pmax - pmin)
    tcn = (clo - org) / safe_d
    tcf = (chi - org) / safe_d
    t_exit = jnp.min(jnp.maximum(tcn, tcf))
    gx, gy = sres[0], sres[1]
    idx = row[MT_SOFF].astype(jnp.int32) + \
        (cell[2] * gy + cell[1]) * gx + cell[0]
    maj_cell = scene.svox_data[idx]

    before = t_cur < t0
    after = t_cur >= t1
    outside = before | after | (t0 > t1)
    maj_het = jnp.where(outside, jnp.zeros(3), maj_cell)
    # inside the box: guarantee forward progress for boundary-sitting
    # lanes (tq's nudge stays within the supervoxel build's one-node
    # conservative margin, scene/compile.py _super_majorants)
    t_end_het = jnp.where(before & (t0 <= t1), t0,
                          jnp.where(after | (t0 > t1), INF,
                                    jnp.maximum(t_exit, tq)))

    is_het = row[MT_TYPE] == MED_HETEROGENEOUS
    maj = jnp.where(is_het, maj_het, hom)
    t_end = jnp.where(is_het, jnp.minimum(t_end_het, t_hit), t_hit)
    return maj, t_end


def _free_flight(scene, options, hs, org, d, med_id, t_hit,
                 with_scatter, row=None):
    """Delta-tracking along [0, t_hit). hs: uint32 sub-stream root.
    `row`: prefetched wide medium row (media.med_row) — passed by the
    hot callers so the loop body does no medium-table gathers.
    Returns (transmittance, trans_dir_pdf, trans_nee_pdf, scatter,
    accum_t). with_scatter=False gives the ratio-tracking NEE variant (no
    real/null decision; transmittance picks up sigma_n).

    The loop walks piecewise-constant majorant segments
    (_majorant_segment): one iteration either processes a tentative
    collision inside the current segment (real/null decision against the
    LOCAL majorant — unbiased for any local bound >= sigma_t) or skips
    deterministically to the segment end, multiplying all three products
    by exp(-majorant * dt) exactly like the reference's
    reached-the-surface branch (vol_path_tracing.h:607-612)."""
    from lajolla_tpu.integrators.media import med_row
    if row is None:
        row = med_row(scene, med_id)
    majorant0 = get_majorant(scene, med_id, org, d, t_hit, row=row)
    channel = jnp.clip((_u(hs, 0) * 3).astype(jnp.int32), 0, 2)
    maj0_ch = majorant0[channel]

    def cond(st):
        (accum_t, it, trans, tdp, tnp, scatter, done) = st
        return ~done & (maj0_ch > 0) & (it < options.max_null_collisions)

    def body(st):
        (accum_t, it, trans, tdp, tnp, scatter, done) = st
        majorant, t_end = _majorant_segment(scene, row, org, d,
                                            accum_t, t_hit)
        maj_ch = majorant[channel]
        max_maj = jnp.maximum(jnp.max(majorant), 1e-20)
        u = jnp.stack([_uit(hs, it, 0), _uit(hs, it, 1)])
        t = jnp.where(maj_ch > 0,
                      -jnp.log(jnp.maximum(1.0 - u[0], 1e-20)) /
                      jnp.maximum(maj_ch, 1e-20), INF)
        dt = t_end - accum_t
        t_next = jnp.minimum(accum_t + t, t_end)
        in_flight = t < dt
        hit_end = ~in_flight & (t_end >= t_hit)

        p = org + d * t_next
        sigma_s, sigma_a = _sigmas(scene, row, p)
        sigma_t = sigma_s + sigma_a
        sigma_n = majorant * (1.0 - sigma_t / jnp.maximum(majorant, 1e-20))
        real_prob = sigma_t / jnp.maximum(majorant, 1e-20)
        # clamp inf distances (majorant-0 segments / unbounded media):
        # 0 * inf would be NaN where exp(-0 * dt) must be 1
        att = jnp.exp(-majorant * jnp.minimum(t, 1e30))
        att_dt = jnp.exp(-majorant * jnp.minimum(dt, 1e30))

        if with_scatter:
            is_real = u[1] < real_prob[channel]
            trans_n = jnp.where(
                in_flight,
                jnp.where(is_real, trans * att / max_maj,
                          trans * att * sigma_n / max_maj),
                trans * att_dt)
            tdp_n = jnp.where(
                in_flight,
                jnp.where(is_real,
                          tdp * att * majorant * real_prob / max_maj,
                          tdp * att * majorant * (1.0 - real_prob) /
                          max_maj),
                tdp * att_dt)
            tnp_n = jnp.where(
                in_flight,
                jnp.where(is_real, tnp,
                          tnp * att * majorant / max_maj),
                tnp * att_dt)
            scatter_n = scatter | (in_flight & is_real)
            done_n = done | hit_end | (in_flight & is_real)
        else:
            # NEE ratio tracking (:384-404): no real/null decision
            trans_n = jnp.where(in_flight,
                                trans * att * sigma_n / max_maj,
                                trans * att_dt)
            tnp_n = jnp.where(in_flight,
                              tnp * att * majorant / max_maj,
                              tnp * att_dt)
            tdp_n = jnp.where(in_flight,
                              tdp * att * majorant * (1.0 - real_prob) /
                              max_maj,
                              tdp * att_dt)
            scatter_n = scatter
            done_n = done | hit_end | (jnp.max(trans_n) <= 0)

        return (t_next, it + 1, trans_n, tdp_n, tnp_n, scatter_n,
                done_n)

    ones = jnp.ones(3)
    init = (jnp.float32(0.0), jnp.int32(0), ones, ones, ones,
            jnp.bool_(False), jnp.bool_(False))
    (accum_t, _it, trans, tdp, tnp, scatter, _done) = \
        jax.lax.while_loop(cond, body, init)
    return trans, tdp, tnp, scatter, accum_t


# ---------------------------------------------------------------------------
# Volumetric NEE (vol_path_tracing.h:299-495)
# ---------------------------------------------------------------------------

def _vol_nee(scene, options, hb, p, med_id, bounces, dir_view, is_surface,
             hit, row=None):
    from lajolla_tpu.integrators.media import med_row
    if row is None:
        row = med_row(scene, med_id)
    eps_shadow = shadow_eps(scene.meta.scene_radius)
    hs = _pcg_hash(hb + jnp.uint32(_S_NEE))
    u = jnp.stack([_u(hs, 0), _u(hs, 1), _u(hs, 2), _u(hs, 3)])
    light_id = sample_light(scene, u[2])
    lp = sample_point_on_light(scene, light_id, p, u[0:2], u[3])
    dir_light = normalize(lp.position - p)
    p_prime = lp.position
    p_origin = p

    ones = jnp.ones(3)

    def seg_cond(st):
        (p, med, sb, Tl, pn, pd, done, blocked) = st
        return ~done & ~blocked & (sb < MAX_SHADOW_SEGMENTS)

    def seg_body(st):
        (p, med, sb, Tl, pn, pd, done, blocked) = st
        tmax = (1.0 - eps_shadow) * distance(p, p_prime)
        shadow_hit = intersect_scene(scene, p, dir_light, eps_shadow, tmax)
        next_t = jnp.where(shadow_hit.valid,
                           distance(p, shadow_hit.position),
                           distance(p, p_prime))
        if scene.meta.num_media > 0:
            has_med = med >= 0
            hseg = _pcg_hash(hs ^ _pcg_hash(
                sb.astype(jnp.uint32) + jnp.uint32(_S_NEE_SEG)))
            row_seg = med_row(scene, med)
            trans, tdp, tnp, _sc, _at = _free_flight(
                scene, options, hseg, p, dir_light, med, next_t,
                with_scatter=False, row=row_seg)
            Tl = jnp.where(has_med, Tl * trans, Tl)
            pn = jnp.where(has_med, pn * tnp, pn)
            pd = jnp.where(has_med, pd * tdp, pd)

        opaque = shadow_hit.valid & (shadow_hit.material_id >= 0)
        depth_block = shadow_hit.valid & (options.max_depth != -1) & \
            (bounces + sb + 1 >= options.max_depth)
        blocked = blocked | opaque | depth_block
        done = done | ~shadow_hit.valid
        med = jnp.where(shadow_hit.valid & ~blocked,
                        update_medium(shadow_hit, dir_light, med), med)
        p = jnp.where(shadow_hit.valid & ~blocked,
                      p + next_t * dir_light, p)
        return (p, med, sb + 1, Tl, pn, pd, done, blocked)

    init = (p, med_id, jnp.int32(0), ones, ones, ones,
            jnp.bool_(False), jnp.bool_(False))
    (_p, _med, _sb, Tl, p_nee, p_dir_t, done, blocked) = \
        jax.lax.while_loop(seg_cond, seg_body, init)

    ok = ~blocked & (jnp.max(Tl) > 0)

    Le = emission_area(scene, light_id, lp.normal, -dir_light)
    jac = jnp.maximum(-dot(dir_light, lp.normal), 0.0) / \
        jnp.maximum(distance_squared(p_origin, p_prime), 1e-20)
    pdf_nee = light_pmf(scene, light_id) * \
        pdf_point_on_light(scene, light_id, lp, p_origin) * p_nee

    if is_surface:
        mat_id = hit.material_id
        f = eval_bsdf(scene, mat_id, dir_view, dir_light, hit)
        pdf_b = pdf_bsdf(scene, mat_id, dir_view, dir_light, hit)
        ok = ok & (pdf_b > 0)
        pdf_dir = pdf_b * jac * p_dir_t
    else:
        f = phase_eval(scene, med_id, dir_view, dir_light, row=row)
        pdf_dir = phase_pdf(scene, med_id, dir_view, dir_light,
                            row=row) * jac * p_dir_t

    contrib = Tl * f * Le * jac / jnp.maximum(_avg(pdf_nee), 1e-30)
    w = (pdf_nee * pdf_nee) / jnp.maximum(
        pdf_nee * pdf_nee + pdf_dir * pdf_dir, 1e-30)
    return jnp.where(ok, contrib * w, jnp.zeros(3))


# ---------------------------------------------------------------------------
# The final integrator (vol_path_tracing.h:503-869)
# ---------------------------------------------------------------------------

def _advance_vol_lane(scene, options, st, su):
    """ONE bounce of the final integrator for a single lane (vmapped by
    the wavefront driver). st = (item, org, d, medium, T, L, bounces,
    dir_pdf, nee_p, multi_trans_pdf, eta_scale, spread, radius, done).
    Returns (new_state, died) where died marks the path completing THIS
    step. spread/radius are the scalar ray-differential state threaded
    through surface bounces like the surface engine (path.py:49-58;
    reference passes ray_diff through vol_path_tracing.h:543) so textured
    surfaces inside media select mips."""
    (item, org, d, medium, T, L, bounces, dir_pdf, nee_p,
     multi_trans_pdf, eta_scale, spread, radius, done) = st
    eps_isect = intersection_eps(scene.meta.scene_radius)
    max_depth = options.max_depth
    ones = jnp.ones(3)
    active = ~done
    hb = _pcg_hash(item.astype(jnp.uint32) ^
                   _pcg_hash(bounces.astype(jnp.uint32) ^ su))

    hit = intersect_scene(scene, org, d, eps_isect, INF, radius, spread)
    t_hit = jnp.where(hit.valid, hit.t, INF)

    from lajolla_tpu.integrators.media import med_row
    mrow = med_row(scene, medium)   # ONE wide fetch per bounce
    in_medium = medium >= 0
    if scene.meta.num_media > 0:
        trans, tdp, tnp, scatter, accum_t = _free_flight(
            scene, options, _pcg_hash(hb + jnp.uint32(_S_FF)), org, d,
            medium, t_hit, with_scatter=True, row=mrow)
        trans = jnp.where(in_medium, trans, ones)
        tdp = jnp.where(in_medium, tdp, ones)
        tnp = jnp.where(in_medium, tnp, ones)
        scatter = scatter & in_medium
        multi_trans_pdf = jnp.where(in_medium, multi_trans_pdf * tdp,
                                    multi_trans_pdf)
        scatter_pos = org + d * accum_t
    else:
        trans = tdp = tnp = ones
        scatter = jnp.bool_(False)
        scatter_pos = org
        accum_t = jnp.float32(0.0)

    # vacuum miss: the fork discards the path entirely (:634-641)
    vacuum_miss = ~in_medium & ~hit.valid
    L = jnp.where(active & vacuum_miss, 0.0, L)
    active = active & ~vacuum_miss

    new_org = jnp.where(scatter, scatter_pos,
                        jnp.where(hit.valid, hit.position, org))
    T = T * trans / jnp.maximum(_avg(tdp), 1e-30)
    # footprint grows with distance traveled (path.py:77)
    t_adv = jnp.where(scatter, accum_t, jnp.where(hit.valid, hit.t, 0.0))
    radius = radius + spread * t_adv

    # ---- emission (:652-711) -------------------------------------------
    hit_light = active & ~scatter & hit.valid & (hit.light_id >= 0)
    Le = emission_area(scene, hit.light_id, hit.geometry_normal, -d)
    lp2 = LightPoint(position=hit.position, normal=hit.geometry_normal)
    pdf_nee_l = light_pmf(scene, hit.light_id) * \
        pdf_point_on_light(scene, hit.light_id, lp2, nee_p) * tnp
    jac = jnp.maximum(-dot(-d, hit.geometry_normal), 0.0) / \
        jnp.maximum(distance_squared(nee_p, hit.position), 1e-20)
    pdf_phase_l = dir_pdf * multi_trans_pdf * jac
    w_l = (pdf_phase_l * pdf_phase_l) / jnp.maximum(
        pdf_phase_l * pdf_phase_l + pdf_nee_l * pdf_nee_l, 1e-30)
    first = bounces == 0
    L = L + jnp.where(hit_light,
                      T * Le * jnp.where(first, ones, w_l), 0.0)
    active = active & ~(hit_light & first)  # :668 returns at bounce 0

    # ---- index-matching pass-through (:716-726) ------------------------
    pass_through = active & ~scatter & hit.valid & (hit.material_id < 0)
    medium_pt = update_medium(hit, d, medium)

    # ---- depth limit (:731-733) ----------------------------------------
    depth_stop = (max_depth != -1) & (bounces >= max_depth - 1)
    active_work = active & ~pass_through & ~depth_stop
    active = active & ~(depth_stop & ~pass_through)
    # non-surface non-scatter non-passthrough lanes terminate (miss into
    # a medium boundary / escaped rays already handled above)
    active = active & (scatter | hit.valid)

    # ---- scatter in medium (:737-784) ----------------------------------
    do_scatter = active_work & scatter & in_medium
    sigma_s = get_sigma_s(scene, medium, new_org, row=mrow)
    nee_s = _vol_nee(scene, options, hb, new_org, medium, bounces,
                     -d, False, hit, row=mrow)
    L = L + jnp.where(do_scatter, T * sigma_s * nee_s, 0.0)
    hph = _pcg_hash(hb + jnp.uint32(_S_PHASE))
    u_ph = jnp.stack([_u(hph, 0), _u(hph, 1)])
    next_dir = phase_sample(scene, medium, -d, u_ph, row=mrow)
    ph_pdf = phase_pdf(scene, medium, -d, next_dir, row=mrow)
    ph_f = phase_eval(scene, medium, -d, next_dir, row=mrow)
    T_scatter = T * (ph_f / jnp.maximum(ph_pdf, 1e-30)) * sigma_s

    # ---- surface interaction (:786-848) --------------------------------
    do_surface = active_work & ~scatter & hit.valid
    nee_b = _vol_nee(scene, options, _pcg_hash(hb + jnp.uint32(7)),
                     new_org, medium, bounces, -d, True, hit, row=mrow)
    L = L + jnp.where(do_surface, T * nee_b, 0.0)
    hbs = _pcg_hash(hb + jnp.uint32(_S_BSDF))
    u_b = jnp.stack([_u(hbs, 0), _u(hbs, 1), _u(hbs, 2)])
    rec = sample_bsdf(scene, hit.material_id, -d, hit, u_b[0:2], u_b[2])
    f = eval_bsdf(scene, hit.material_id, -d, rec.dir_out, hit)
    pdf_b = pdf_bsdf(scene, hit.material_id, -d, rec.dir_out, hit)
    bsdf_ok = rec.valid & (pdf_b > 0)
    active = active & ~(do_surface & ~bsdf_ok)
    is_refract = rec.eta != 0.0
    eta_scale = jnp.where(do_surface & is_refract,
                          eta_scale / jnp.maximum(rec.eta * rec.eta,
                                                  1e-12), eta_scale)
    medium_sf = jnp.where(is_refract,
                          update_medium(hit, rec.dir_out, medium),
                          medium)
    T_surface = T * f / jnp.maximum(pdf_b, 1e-30)
    new_spread = jnp.where(
        is_refract,
        _ray_diff_refract(spread, radius, hit.mean_curvature,
                          jnp.maximum(rec.eta, 1e-6), rec.roughness),
        _ray_diff_reflect(spread, radius, hit.mean_curvature,
                          rec.roughness))
    spread = jnp.where(do_surface, new_spread, spread)

    # nee cache update (:755-760, :806-810)
    nee_valid = (do_scatter & (jnp.max(nee_s) > 0)) | \
        (do_surface & (jnp.max(nee_b) > 0))
    nee_p = jnp.where(nee_valid, new_org, nee_p)

    # ---- merge branch results ------------------------------------------
    d_next = jnp.where(do_scatter, next_dir,
                       jnp.where(do_surface, rec.dir_out, d))
    T = jnp.where(do_scatter, T_scatter,
                  jnp.where(do_surface, T_surface, T))
    medium = jnp.where(pass_through, medium_pt,
                       jnp.where(do_surface, medium_sf, medium))
    dir_pdf = jnp.where(do_scatter, ph_pdf, dir_pdf)
    multi_trans_pdf = jnp.where(do_scatter, ones, multi_trans_pdf)

    # ---- russian roulette (:851-862) -----------------------------------
    do_rr = (bounces >= options.rr_depth) & active & ~pass_through
    rr_prob = jnp.where(do_rr,
                        jnp.minimum(jnp.max(T / eta_scale), 0.95), 1.0)
    u_rr = _u(_pcg_hash(hb + jnp.uint32(_S_RR)), 0)
    active = active & ~(do_rr & (u_rr > rr_prob))
    T = jnp.where(do_rr, T / jnp.maximum(rr_prob, 1e-20), T)

    active = active & (bounces + 1 < MAX_BOUNCES_CAP)
    died = ~done & ~active
    nst = (item, new_org, d_next, medium, T, L, bounces + 1, dir_pdf,
           nee_p, multi_trans_pdf, eta_scale, spread, radius, done)
    return nst, died


# ---------------------------------------------------------------------------
# Pedagogical versions 1 & 2 (vol_path_tracing.h:6-147)
# ---------------------------------------------------------------------------

def volpath1_trace_one(scene, options, px, py, key):
    """Absorption only, single homogeneous exterior volume (:6-41)."""
    key, sub = jax.random.split(key)
    u_pix = jax.random.uniform(sub, (2,))
    org, d = sample_primary(scene, options, px.astype(jnp.float32),
                            py.astype(jnp.float32), u_pix)
    hit = intersect_scene(scene, org, d, 0.0, INF)
    has_med = hit.valid & (hit.exterior_med >= 0)
    sigma_a = get_sigma_a(scene, hit.exterior_med, hit.position)
    t_hit = distance(hit.position, org)
    transmittance = jnp.exp(-sigma_a * t_hit)
    Le = jnp.where(hit.light_id >= 0,
                   emission_area(scene, hit.light_id, hit.geometry_normal,
                                 -d), jnp.zeros(3))
    return jnp.where(has_med, transmittance * Le, jnp.zeros(3))


def volpath2_trace_one(scene, options, px, py, key):
    """Single monochromatic homogeneous volume, single scattering (:46-147)."""
    eps_shadow = shadow_eps(scene.meta.scene_radius)
    key, sub = jax.random.split(key)
    u_pix = jax.random.uniform(sub, (2,))
    org, d = sample_primary(scene, options, px.astype(jnp.float32),
                            py.astype(jnp.float32), u_pix)
    hit = intersect_scene(scene, org, d, 0.0, INF)
    medium = jnp.where(hit.valid, hit.exterior_med,
                       jnp.int32(scene.meta.camera_medium_id))
    t_hit = jnp.where(hit.valid, distance(hit.position, org), INF)

    sigma_s = get_sigma_s(scene, medium, hit.position)
    sigma_a = get_sigma_a(scene, medium, hit.position)
    sigma_t = sigma_s + sigma_a

    key, u = _uniforms(key, 5)
    t = -jnp.log(jnp.maximum(1.0 - u[0], 1e-20)) / \
        jnp.maximum(sigma_t[0], 1e-20)

    # scatter before surface
    trans_pdf_s = jnp.exp(-sigma_t * t) * sigma_t
    transmittance_s = jnp.exp(-sigma_t * t)
    p = org + t * d
    light_id = sample_light(scene, u[3])
    lp = sample_point_on_light(scene, light_id, p, u[1:3], u[4])
    dir_light = normalize(lp.position - p)
    rho = phase_eval(scene, medium, -d, dir_light)
    Le = emission_area(scene, light_id, lp.normal, -dir_light)
    dist_l = distance(p, lp.position)
    exp_term = jnp.exp(-sigma_t * dist_l)
    from lajolla_tpu.scene.geometry import occluded
    occ = occluded(scene, p, dir_light, eps_shadow,
                   (1.0 - eps_shadow) * dist_l)
    jac = jnp.abs(dot(dir_light, lp.normal)) / \
        jnp.maximum(distance_squared(p, lp.position), 1e-20) * \
        jnp.where(occ, 0.0, 1.0)
    L_s1 = rho * Le * exp_term * jac
    L_s1_pdf = light_pmf(scene, light_id) * \
        pdf_point_on_light(scene, light_id, lp, p)
    scatter_contrib = (transmittance_s / trans_pdf_s) * sigma_s * \
        (L_s1 / jnp.maximum(L_s1_pdf, 1e-30))

    # reach the surface
    trans_pdf_h = jnp.exp(-sigma_t * t_hit)
    transmittance_h = jnp.exp(-sigma_t * t_hit)
    Le_h = jnp.where(hit.valid & (hit.light_id >= 0),
                     emission_area(scene, hit.light_id,
                                   hit.geometry_normal, -d), jnp.zeros(3))
    surf_contrib = transmittance_h / jnp.maximum(trans_pdf_h, 1e-30) * Le_h

    return jnp.where(t < t_hit, scatter_contrib, surf_contrib)


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('options', 'nspp', 'lanes', 'count'))
def _render_volpath_block(scene, options, seed, s0, nspp, lanes=None,
                          i0=0, count=None):
    """Persistent-wavefront queue over (pixel, sample) work items for the
    final integrator: every iteration advances each lane by ONE bounce;
    finished paths splat into the film (dense, queue-stride — see
    path.py _dense_film_add) and regenerate immediately. Returns the film
    SUM over work items [s0*n + i0, s0*n + i0 + count) — `count` < n*nspp
    bounds the device-launch duration for heavy (grid-media) scenes; the
    driver accumulates chunks."""
    w = scene.meta.width
    h = scene.meta.height
    n = w * h
    lanes = lanes or n
    count = count if count is not None else n * nspp
    su = _pcg_hash(jnp.uint32(seed) ^ jnp.uint32(0x701A77E5))

    item0 = jnp.arange(lanes, dtype=jnp.int32) + s0 * n + i0
    _pix, org0, d0 = _primary_hash(scene, options, item0, su)
    med0 = jnp.full(lanes, scene.meta.camera_medium_id, jnp.int32)
    ones = jnp.ones((lanes, 3), jnp.float32)
    z3 = jnp.zeros((lanes, 3), jnp.float32)
    spread0 = jnp.full(lanes, 0.25 / max(w, h), jnp.float32)
    state = (item0, org0, d0, med0, ones, z3,
             jnp.zeros(lanes, jnp.int32),                 # bounces
             jnp.zeros(lanes, jnp.float32),               # dir_pdf
             org0, ones,                                  # nee_p, mtp
             jnp.ones(lanes, jnp.float32),                # eta_scale
             spread0,                                     # ray-diff spread
             jnp.zeros(lanes, jnp.float32),               # ray-diff radius
             jnp.zeros(lanes, jnp.bool_))                 # done
    film0 = jnp.zeros((n, 3), jnp.float32)
    end = s0 * n + i0 + count

    def cond(carry):
        st, film = carry
        return ~jnp.all(st[13])

    def body(carry):
        st, film = carry
        nst, died = jax.vmap(
            lambda *s: _advance_vol_lane(scene, options, s, su))(*st)
        (item, org, d, medium, T, L, bounces, dir_pdf, nee_p, mtp,
         eta_scale, spread, radius, done) = nst

        # NaN exclusion at the splat, as in the reference film loop
        # (render.cpp:140-143)
        pixel = (item % n).astype(jnp.int32)
        contrib = jnp.where(died[:, None] & jnp.isfinite(L), L, 0.0)
        film = _dense_film_add(film, pixel, contrib, n, lanes)

        next_item = item + lanes
        has_more = next_item < end
        regen = died & has_more
        done = done | (died & ~has_more)

        _rp, rorg, rd = _primary_hash(scene, options, next_item, su)
        sel = lambda a, b: jnp.where(regen, a, b)
        selv = lambda a, b: jnp.where(regen[:, None], a, b)
        state_new = (
            sel(next_item, item),
            selv(rorg, org),
            selv(rd, d),
            sel(jnp.full_like(medium, scene.meta.camera_medium_id), medium),
            selv(jnp.ones_like(T), T),
            selv(jnp.zeros_like(L), L),
            sel(jnp.zeros_like(bounces), bounces),
            sel(jnp.zeros_like(dir_pdf), dir_pdf),
            selv(rorg, nee_p),
            selv(jnp.ones_like(mtp), mtp),
            sel(jnp.ones_like(eta_scale), eta_scale),
            sel(jnp.full_like(spread, 0.25 / max(w, h)), spread),
            sel(jnp.zeros_like(radius), radius),
            done,
        )
        return (state_new, film)

    (_, film) = jax.lax.while_loop(cond, body, (state, film0))
    return film


@partial(jax.jit, static_argnames=('options', 'nspp', 'tile'))
def _render_volpath_simple_block(scene, options, seed, s0, nspp, p0=0,
                                 tile=None):
    """Per-pixel driver for the single-bounce pedagogical versions 1-2."""
    w = scene.meta.width
    h = scene.meta.height
    n = w * h
    tile = tile or n
    root = jax.random.PRNGKey(seed)
    pix = (jnp.arange(tile, dtype=jnp.uint32) +
           jnp.uint32(0) + jnp.asarray(p0, jnp.uint32))
    px = (pix % w).astype(jnp.int32)
    py = (pix // w).astype(jnp.int32)
    pixel_keys = jax.vmap(jax.random.fold_in, (None, 0))(root, pix)
    tracer = {1: volpath1_trace_one, 2: volpath2_trace_one}[
        options.vol_path_version]
    trace = jax.vmap(tracer, in_axes=(None, None, 0, 0, 0))

    def one_spp(i, img):
        keys = jax.vmap(jax.random.fold_in, (0, None))(
            pixel_keys, (s0 + i).astype(jnp.uint32))
        L = trace(scene, options, px, py, keys)
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        return img + L

    return jax.lax.fori_loop(0, nspp, one_spp,
                             jnp.zeros((tile, 3), jnp.float32))


VOL_SPP_BLOCK = 4
VOL_LANES = 131072


def render_volpath(scene, options, seed=0, checkpoint=None, progress=False):
    import numpy as np
    from lajolla_tpu.utils.checkpoint import load_film, save_film
    from lajolla_tpu.utils.progress import ProgressReporter
    w = scene.meta.width
    h = scene.meta.height
    n = w * h
    spp = options.samples_per_pixel
    simple = options.vol_path_version in (1, 2)
    # heterogeneous media run long null-collision chains → shorter
    # launches (the lockstep inner loop can run hundreds of iterations)
    lanes = min(16384 if scene.meta.has_grid_volumes else VOL_LANES, n)
    spp_block = 1 if scene.meta.has_grid_volumes else VOL_SPP_BLOCK

    img, spp_done = None, 0
    if checkpoint:
        img, spp_done = load_film(checkpoint, seed, (n, 3))
    if img is None:
        img = np.zeros((n, 3), np.float32)
    rep = ProgressReporter(spp, label="volpath", enabled=progress)
    rep.done = spp_done
    s0 = spp_done
    # grid-media paths run long lockstep null-collision loops; bound each
    # device launch by chunking the work-item range (the axon worker
    # crashes on launches over ~60 s)
    chunk = 2 * lanes if scene.meta.has_grid_volumes else None
    while s0 < spp:
        ns = min(spp_block, spp - s0)
        if simple:
            block = _render_volpath_simple_block(scene, options, seed, s0,
                                                 ns, 0, n)
            img += np.asarray(block)
        elif chunk is None:
            img += np.asarray(_render_volpath_block(scene, options, seed,
                                                    s0, ns, lanes))
        else:
            i0 = 0
            while i0 < n * ns:
                c = min(chunk, n * ns - i0)
                img += np.asarray(_render_volpath_block(
                    scene, options, seed, s0, ns, lanes, i0, c))
                i0 += c
        s0 += ns
        rep.update(ns)
        if checkpoint:
            save_film(checkpoint, seed, img, s0)
    rep.finish()
    return (img / spp).reshape(h, w, 3)
