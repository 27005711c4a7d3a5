"""Full DisneyBSDF: 5-lobe combination (diffuse+subsurface, metal with
achromatic-specular C0, anisotropic glass, clearcoat, sheen) with
normalized lobe-weight sampling (reference: materials/disney_bsdf.inl;
lobe weights :211-215, sampling :403-431, inside-surface glass-only
:408-422, mixed pdf :382-386)."""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, luminance, normalize, to_local, to_world
from lajolla_tpu.core.math import safe_sqrt
from lajolla_tpu.materials import SampleRec
from lajolla_tpu.materials.common import (PI, TWO_PI, fresnel_dielectric,
                                          gtr2_aniso, sample_cos_hemisphere,
                                          sample_visible_normals_aniso,
                                          smith_g_ggx_aniso,
                                          smith_masking_gtr2, tex1, tex3)
from lajolla_tpu.materials.disney_clearcoat import _dc_ref, _schlick_f
from lajolla_tpu.materials.disney_metal import aniso_alphas
from lajolla_tpu.materials.disney_sheen import sheen_color
from lajolla_tpu.scene.soa import fetch_mat
from lajolla_tpu.scene import types as T


def _params(scene, mat_id, hit):
    p = {}
    p['base_color'] = tex3(scene, mat_id, T.P_BASE_COLOR, hit)
    for name, slot in [('spec_trans', T.P_SPEC_TRANS),
                       ('metallic', T.P_METALLIC),
                       ('subsurface', T.P_SUBSURFACE),
                       ('specular', T.P_SPECULAR),
                       ('roughness', T.P_ROUGHNESS),
                       ('specular_tint', T.P_SPECULAR_TINT),
                       ('anisotropic', T.P_ANISOTROPIC),
                       ('sheen', T.P_SHEEN),
                       ('sheen_tint', T.P_SHEEN_TINT),
                       ('clearcoat', T.P_CLEARCOAT),
                       ('clearcoat_gloss', T.P_CLEARCOAT_GLOSS)]:
        p[name] = tex1(scene, mat_id, slot, hit)
    p['eta0'] = fetch_mat(scene, mat_id).eta
    return p


def _frames(hit, dir_in):
    g_dot_in = dot(hit.geometry_normal, dir_in)
    fr = hit.frame
    frame_r = jnp.where(dot(fr[2], dir_in) < 0, -fr, fr)  # reflective lobes
    frame_g = jnp.where(dot(fr[2], dir_in) * g_dot_in < 0, -fr, fr)  # glass
    return frame_r, frame_g, g_dot_in


def _lobe_weights(p, g_dot_in):
    dw = (1.0 - p['metallic']) * (1.0 - p['spec_trans'])
    mw = 1.0 - p['spec_trans'] * (1.0 - p['metallic'])
    gw = (1.0 - p['metallic']) * p['spec_trans']
    cw = 0.25 * p['clearcoat']
    inside = g_dot_in < 0
    dw = jnp.where(inside, 0.0, dw)
    mw = jnp.where(inside, 0.0, mw)
    cw = jnp.where(inside, 0.0, cw)
    gw = jnp.where(inside, jnp.where(gw > 0, 1.0, 0.0), gw)
    total = dw + mw + gw + cw
    ok = total > 0
    tot = jnp.maximum(total, 1e-20)
    return dw / tot, mw / tot, gw / tot, cw / tot, ok


def _glass_terms(p, frame_g, dir_in, dir_out, g_dot_in, g_dot_out):
    eta = jnp.where(g_dot_in > 0, p['eta0'], 1.0 / p['eta0'])
    reflect = g_dot_in * g_dot_out > 0
    rough = jnp.clip(p['roughness'], 0.01, 1.0)
    ax, ay = aniso_alphas(rough, p['anisotropic'])
    h = jnp.where(reflect, normalize(dir_in + dir_out),
                  normalize(dir_in + dir_out * eta))
    h = jnp.where(dot(h, frame_g[2]) < 0, -h, h)
    h_dot_in = dot(h, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)
    D = gtr2_aniso(to_local(frame_g, h), ax, ay)
    G_in = smith_g_ggx_aniso(to_local(frame_g, dir_in), ax, ay)
    return eta, reflect, h, h_dot_in, F, D, G_in


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    p = _params(scene, mat_id, hit)
    frame_r, frame_g, g_dot_in = _frames(hit, dir_in)
    g_dot_out = dot(hit.geometry_normal, dir_out)
    outside = (g_dot_in >= 0) & (g_dot_out >= 0)

    base_color = p['base_color']
    rough_raw = p['roughness']
    rough = jnp.clip(rough_raw, 0.01, 1.0)

    h_r = normalize(dir_in + dir_out)
    h_dot_out = dot(h_r, dir_out)
    n_dot_in = dot(frame_r[2], dir_in)
    n_dot_out = dot(frame_r[2], dir_out)

    # ---- diffuse (unclamped roughness, like the reference) ---------------
    fd90 = 0.5 + 2.0 * rough_raw * h_dot_out * h_dot_out
    fd_in = 1.0 + (fd90 - 1.0) * (1.0 - n_dot_in ** 5)
    fd_out = 1.0 + (fd90 - 1.0) * (1.0 - n_dot_out ** 5)
    f_d = base_color * fd_in * fd_out * jnp.abs(n_dot_out) / PI
    fss90 = rough_raw * h_dot_out * h_dot_out
    fss_in = 1.0 + (fss90 - 1.0) * (1.0 - n_dot_in ** 5)
    fss_out = 1.0 + (fss90 - 1.0) * (1.0 - n_dot_out ** 5)
    f_ss = (1.25 * base_color *
            (fss_in * fss_out * (1.0 / jnp.maximum(
                jnp.abs(n_dot_in) + jnp.abs(n_dot_out), 1e-20) - 0.5) + 0.5) *
            jnp.abs(n_dot_out) / PI)
    f_diffuse = (1.0 - p['subsurface']) * f_d + p['subsurface'] * f_ss

    # ---- metal with achromatic specular C0 (disney_bsdf.inl:83-91) -------
    lum = luminance(base_color)
    c_tint = jnp.where(lum <= 0, jnp.ones(3),
                       base_color / jnp.maximum(lum, 1e-20))
    r0 = (1.5 - 1.0) ** 2 / (1.5 + 1.0) ** 2
    ks = (1.0 - p['specular_tint']) + p['specular_tint'] * c_tint
    c0 = (p['specular'] * r0 * (1.0 - p['metallic']) * ks +
          p['metallic'] * base_color)
    Fm = c0 + (1.0 - c0) * (1.0 - h_dot_out) ** 5
    ax, ay = aniso_alphas(rough, p['anisotropic'])
    Dm = gtr2_aniso(to_local(frame_r, h_r), ax, ay)
    Gin = smith_g_ggx_aniso(to_local(frame_r, dir_in), ax, ay)
    Gout = smith_g_ggx_aniso(to_local(frame_r, dir_out), ax, ay)
    f_metal = Fm * Dm * Gin * Gout / jnp.maximum(
        4.0 * jnp.abs(n_dot_in), 1e-20)

    # ---- clearcoat ---------------------------------------------------------
    n_dot_h = dot(frame_r[2], h_r)
    Fc = _schlick_f(h_r, dir_out)
    Dc = _dc_ref(p['clearcoat_gloss'], n_dot_h * n_dot_h)
    Gc = (smith_masking_gtr2(to_local(frame_r, dir_in), 0.5) *
          smith_masking_gtr2(to_local(frame_r, dir_out), 0.5))
    f_clearcoat = jnp.where(n_dot_h > 0,
                            Fc * Dc * Gc / jnp.maximum(
                                4.0 * jnp.abs(n_dot_in), 1e-20), 0.0)
    f_clearcoat = jnp.full(3, 1.0) * f_clearcoat

    # ---- sheen -------------------------------------------------------------
    c_sheen = sheen_color(base_color, p['sheen_tint'])
    f_sheen = (c_sheen * (1.0 - jnp.abs(h_dot_out)) ** 5 *
               jnp.abs(n_dot_out))

    # ---- glass (always active, incl. inside) -------------------------------
    eta, reflect, h, h_dot_in, F, D, G_in = _glass_terms(
        p, frame_g, dir_in, dir_out, g_dot_in, g_dot_out)
    Gg = G_in  # reference uses only G_in for the glass G (disney lobe)
    n_dot_in_g = jnp.abs(dot(frame_g[2], dir_in))
    f_glass_r = base_color * (F * D * Gg) / jnp.maximum(
        4.0 * n_dot_in_g, 1e-20)
    h_dot_out_g = dot(h, dir_out)
    denom = (h_dot_in + eta * h_dot_out_g) ** 2
    f_glass_t = (safe_sqrt(base_color) * (1.0 - F) * D * Gg *
                 jnp.abs(h_dot_out_g * h_dot_in) /
                 jnp.maximum(n_dot_in_g * denom, 1e-20))
    f_glass = jnp.where(reflect, f_glass_r, f_glass_t)

    gate = outside
    f_diffuse = jnp.where(gate & (g_dot_in >= 0), f_diffuse, 0.0)
    f_metal = jnp.where(gate, f_metal, 0.0)
    f_clearcoat = jnp.where(gate, f_clearcoat, 0.0)
    f_sheen = jnp.where(gate, f_sheen, 0.0)

    sT, m = p['spec_trans'], p['metallic']
    return ((1.0 - sT) * (1.0 - m) * f_diffuse
            + (1.0 - m) * p['sheen'] * f_sheen
            + (1.0 - sT * (1.0 - m)) * f_metal
            + 0.25 * p['clearcoat'] * f_clearcoat
            + (1.0 - m) * sT * f_glass)


def pdf(scene, mat_id, dir_in, dir_out, hit, adjoint):
    p = _params(scene, mat_id, hit)
    frame_r, frame_g, g_dot_in = _frames(hit, dir_in)
    g_dot_out = dot(hit.geometry_normal, dir_out)
    reflect = g_dot_in * g_dot_out > 0
    dw, mw, gw, cw, ok = _lobe_weights(p, g_dot_in)

    diffuse_pdf = jnp.maximum(dot(frame_r[2], dir_out), 0.0) / PI

    rough = jnp.clip(p['roughness'], 0.01, 1.0)
    ax, ay = aniso_alphas(rough, p['anisotropic'])
    h_r = normalize(dir_in + dir_out)
    Dm = gtr2_aniso(to_local(frame_r, h_r), ax, ay)
    Gin = smith_g_ggx_aniso(to_local(frame_r, dir_in), ax, ay)
    metal_pdf = Dm * Gin / jnp.maximum(
        4.0 * jnp.abs(dot(dir_in, frame_r[2])), 1e-20)

    n_dot_h = dot(frame_r[2], h_r)
    Dc = _dc_ref(p['clearcoat_gloss'], n_dot_h * n_dot_h)
    clearcoat_pdf = Dc * jnp.abs(n_dot_h) / jnp.maximum(
        4.0 * jnp.abs(dot(h_r, dir_out)), 1e-20)

    eta, _, h, h_dot_in, F, D, G_in = _glass_terms(
        p, frame_g, dir_in, dir_out, g_dot_in, g_dot_out)
    n_dot_in_g = dot(frame_g[2], dir_in)
    glass_pdf_r = (F * D * G_in) / jnp.maximum(4.0 * jnp.abs(n_dot_in_g),
                                               1e-20)
    h_dot_out_g = dot(h, dir_out)
    sqrt_denom = h_dot_in + eta * h_dot_out_g
    dh_dout = eta * eta * h_dot_out_g / jnp.maximum(
        sqrt_denom * sqrt_denom, 1e-20)
    glass_pdf_t = (1.0 - F) * D * G_in * jnp.abs(
        dh_dout * h_dot_in / jnp.where(n_dot_in_g == 0, 1.0, n_dot_in_g))
    glass_pdf = jnp.where(reflect, glass_pdf_r, glass_pdf_t)

    total = jnp.where(reflect,
                      dw * diffuse_pdf + mw * metal_pdf +
                      cw * clearcoat_pdf + gw * glass_pdf,
                      gw * glass_pdf)
    return jnp.where(ok, total, 0.0)


def sample(scene, mat_id, dir_in, hit, u2, w, adjoint):
    p = _params(scene, mat_id, hit)
    frame_r, frame_g, g_dot_in = _frames(hit, dir_in)
    dw, mw, gw, cw, ok = _lobe_weights(p, g_dot_in)
    rough = jnp.clip(p['roughness'], 0.01, 1.0)
    ax, ay = aniso_alphas(rough, p['anisotropic'])
    eta = jnp.where(g_dot_in > 0, p['eta0'], 1.0 / p['eta0'])

    # diffuse
    d_diff = to_world(frame_r, sample_cos_hemisphere(u2))

    # metal
    local_dir_in_r = to_local(frame_r, dir_in)
    h_m = to_world(frame_r,
                   sample_visible_normals_aniso(local_dir_in_r, ax, ay, u2))
    d_metal = normalize(-dir_in + 2.0 * dot(dir_in, h_m) * h_m)

    # glass
    local_dir_in_g = to_local(frame_g, dir_in)
    h_g = to_world(frame_g,
                   sample_visible_normals_aniso(local_dir_in_g, ax, ay, u2))
    h_g = jnp.where(dot(h_g, frame_g[2]) < 0, -h_g, h_g)
    h_dot_in = dot(h_g, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)
    rand_new = (w - (dw + mw)) / jnp.maximum(gw, 1e-20)
    d_glass_r = normalize(-dir_in + 2.0 * dot(dir_in, h_g) * h_g)
    h_dot_out_sq = 1.0 - (1.0 - h_dot_in * h_dot_in) / (eta * eta)
    tir = h_dot_out_sq <= 0
    h_flip = jnp.where(h_dot_in < 0, -h_g, h_g)
    h_dot_out = safe_sqrt(h_dot_out_sq)
    d_glass_t = -dir_in / eta + (jnp.abs(h_dot_in) / eta - h_dot_out) * h_flip
    glass_refl = rand_new <= F
    d_glass = jnp.where(glass_refl, d_glass_r, d_glass_t)

    # clearcoat
    a = (1.0 - p['clearcoat_gloss']) * 0.1 + p['clearcoat_gloss'] * 0.001
    a2 = a * a
    cos_h = safe_sqrt(
        (1.0 - a2 ** (1.0 - u2[0])) / jnp.maximum(1.0 - a2, 1e-20))
    sin_h = safe_sqrt(1.0 - cos_h * cos_h)
    azim = TWO_PI * u2[1]
    h_c = to_world(frame_r, normalize(jnp.stack(
        [sin_h * jnp.cos(azim), sin_h * jnp.sin(azim), cos_h])))
    d_cc = normalize(-dir_in + 2.0 * dot(dir_in, h_c) * h_c)

    take_diff = w < dw
    take_metal = (~take_diff) & (w < dw + mw)
    take_glass = (~take_diff) & (~take_metal) & (w < dw + mw + gw)
    take_cc = ~(take_diff | take_metal | take_glass)

    dir_out = jnp.where(take_diff, d_diff,
                        jnp.where(take_metal, d_metal,
                                  jnp.where(take_glass, d_glass, d_cc)))
    out_eta = jnp.where(take_glass & ~glass_refl, eta, 0.0)
    out_rough = jnp.where(take_diff | take_cc, 1.0, rough)
    valid = ok & ~(take_glass & ~glass_refl & tir)
    return SampleRec(dir_out=dir_out, eta=out_eta, roughness=out_rough,
                     valid=valid)
