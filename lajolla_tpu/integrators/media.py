"""Participating media + phase functions (device side; scalar per-lane).

Replaces the Medium/PhaseFunction variant ops (medium.h:22-27,
media/homogeneous.inl, media/heterogeneous.inl, phase_function.cpp,
phase_functions/{isotropic,henyeygreenstein}.inl) and grid-volume
trilinear lookup (volume.h:45-95, :114-144).
"""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, make_frame, normalize, to_world
from lajolla_tpu.scene.types import (MED_HETEROGENEOUS, MED_HOMOGENEOUS,
                                     PHASE_HG, PHASE_ISOTROPIC, VOL_GRID)

PI = 3.141592653589793
TWO_PI = 6.283185307179586
INV_4PI = 1.0 / (4.0 * PI)


# ---------------------------------------------------------------------------
# Volume lookup
# ---------------------------------------------------------------------------

def lookup_volume(scene, vol_id, p):
    """Trilinear grid / constant volume lookup → (3,)
    (volume.h:40-81; scale pre-multiplied into the arrays at compile)."""
    vol_id = jnp.maximum(vol_id, 0)
    kind = scene.vol_kind[vol_id]
    const = scene.vol_const[vol_id]
    if not scene.meta.has_grid_volumes:
        return const

    pmin = scene.vol_pmin[vol_id]
    pmax = scene.vol_pmax[vol_id]
    res = scene.vol_res[vol_id]          # (xres, yres, zres)
    off = scene.vol_offset[vol_id]
    pn = (p - pmin) / jnp.maximum(pmax - pmin, 1e-20)
    inside = jnp.all((pn >= 0.0) & (pn <= 1.0))
    rx, ry, rz = res[0], res[1], res[2]
    fx = pn[0] * (rx - 1).astype(jnp.float32)
    fy = pn[1] * (ry - 1).astype(jnp.float32)
    fz = pn[2] * (rz - 1).astype(jnp.float32)
    x0 = jnp.clip(fx.astype(jnp.int32), 0, rx - 1)
    y0 = jnp.clip(fy.astype(jnp.int32), 0, ry - 1)
    z0 = jnp.clip(fz.astype(jnp.int32), 0, rz - 1)
    x1 = jnp.minimum(x0 + 1, rx - 1)
    y1 = jnp.minimum(y0 + 1, ry - 1)
    z1 = jnp.minimum(z0 + 1, rz - 1)
    dx = fx - x0
    dy = fy - y0
    dz = fz - z0

    def at(z, y, x):
        return scene.volume_data[off + (z * ry + y) * rx + x]

    val = (at(z0, y0, x0) * ((1 - dx) * (1 - dy) * (1 - dz)) +
           at(z0, y0, x1) * (dx * (1 - dy) * (1 - dz)) +
           at(z0, y1, x0) * ((1 - dx) * dy * (1 - dz)) +
           at(z0, y1, x1) * (dx * dy * (1 - dz)) +
           at(z1, y0, x0) * ((1 - dx) * (1 - dy) * dz) +
           at(z1, y0, x1) * (dx * (1 - dy) * dz) +
           at(z1, y1, x0) * ((1 - dx) * dy * dz) +
           at(z1, y1, x1) * (dx * dy * dz))
    grid_val = jnp.where(inside, val, 0.0)
    return jnp.where(kind == VOL_GRID, grid_val, const)


def volume_aabb_hit(scene, vol_id, o, d, tfar):
    """Slab test against the grid bbox (volume.h:114-144); constant
    volumes always 'hit'."""
    vol_id = jnp.maximum(vol_id, 0)
    kind = scene.vol_kind[vol_id]
    pmin = scene.vol_pmin[vol_id]
    pmax = scene.vol_pmax[vol_id]
    safe_d = jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
    tn = (pmin - o) / safe_d
    tf = (pmax - o) / safe_d
    t0 = jnp.max(jnp.minimum(tn, tf))
    t1 = jnp.min(jnp.maximum(tn, tf))
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, tfar)
    return jnp.where(kind == VOL_GRID, t0 <= t1, True)


# ---------------------------------------------------------------------------
# Medium properties (medium.h:25-27)
# ---------------------------------------------------------------------------

def get_majorant(scene, med_id, o, d, tfar):
    med_id = jnp.maximum(med_id, 0)
    typ = scene.med_type[med_id]
    hom = scene.med_sigma_a[med_id] + scene.med_sigma_s[med_id]
    if MED_HETEROGENEOUS not in scene.meta.med_types_present:
        return hom
    dvol = scene.med_density_vol[med_id]
    hit = volume_aabb_hit(scene, dvol, o, d, tfar)
    het = jnp.where(hit, scene.vol_maxval[jnp.maximum(dvol, 0)],
                    jnp.zeros(3))
    return jnp.where(typ == MED_HOMOGENEOUS, hom, het)


def get_sigma_s(scene, med_id, p):
    med_id = jnp.maximum(med_id, 0)
    typ = scene.med_type[med_id]
    hom = scene.med_sigma_s[med_id]
    if MED_HETEROGENEOUS not in scene.meta.med_types_present:
        return hom
    density = lookup_volume(scene, scene.med_density_vol[med_id], p)
    albedo = lookup_volume(scene, scene.med_albedo_vol[med_id], p)
    return jnp.where(typ == MED_HOMOGENEOUS, hom, density * albedo)


def get_sigma_a(scene, med_id, p):
    med_id = jnp.maximum(med_id, 0)
    typ = scene.med_type[med_id]
    hom = scene.med_sigma_a[med_id]
    if MED_HETEROGENEOUS not in scene.meta.med_types_present:
        return hom
    density = lookup_volume(scene, scene.med_density_vol[med_id], p)
    albedo = lookup_volume(scene, scene.med_albedo_vol[med_id], p)
    return jnp.where(typ == MED_HOMOGENEOUS, hom, density * (1.0 - albedo))


# ---------------------------------------------------------------------------
# Phase functions (phase_functions/*.inl)
# ---------------------------------------------------------------------------

def _hg(g, cos_theta):
    return INV_4PI * (1.0 - g * g) / jnp.maximum(
        (1.0 + g * g + 2.0 * g * cos_theta) ** 1.5, 1e-20)


def phase_eval(scene, med_id, dir_in, dir_out):
    """→ (3,) (constant across channels, like the reference)."""
    med_id = jnp.maximum(med_id, 0)
    typ = scene.med_phase_type[med_id]
    g = scene.med_g[med_id]
    hg = _hg(g, dot(dir_in, dir_out))
    val = jnp.where(typ == PHASE_ISOTROPIC, INV_4PI, hg)
    return jnp.full(3, 1.0) * val


def phase_pdf(scene, med_id, dir_in, dir_out):
    med_id = jnp.maximum(med_id, 0)
    typ = scene.med_phase_type[med_id]
    g = scene.med_g[med_id]
    hg = _hg(g, dot(dir_in, dir_out))
    return jnp.where(typ == PHASE_ISOTROPIC, INV_4PI, hg)


def phase_sample(scene, med_id, dir_in, u):
    """HG inverse-CDF with uniform-sphere fallback for |g|<1e-3
    (henyeygreenstein.inl:26-46); isotropic = uniform sphere."""
    med_id = jnp.maximum(med_id, 0)
    typ = scene.med_phase_type[med_id]
    g = scene.med_g[med_id]

    z = 1.0 - 2.0 * u[0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u[1]
    uniform = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z])

    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1.0, g)
    tmp = (g_safe * g_safe - 1.0) / (2.0 * u[0] * g_safe - (g_safe + 1.0))
    cos_el = (tmp * tmp - (1.0 + g_safe * g_safe)) / (2.0 * g_safe)
    sin_el = jnp.sqrt(jnp.maximum(1.0 - cos_el * cos_el, 0.0))
    azimuth = TWO_PI * u[1]
    fr = make_frame(dir_in)
    hg_dir = to_world(fr, jnp.stack([sin_el * jnp.cos(azimuth),
                                     sin_el * jnp.sin(azimuth), cos_el]))
    use_uniform = (typ == PHASE_ISOTROPIC) | (jnp.abs(g) < 1e-3)
    return jnp.where(use_uniform, uniform, hg_dir)


def update_medium(hit, d, medium):
    """Medium transition across an interface (vol_path_tracing.h:149-163)."""
    differs = hit.interior_med != hit.exterior_med
    new_med = jnp.where(dot(d, hit.geometry_normal) > 0,
                        hit.exterior_med, hit.interior_med)
    return jnp.where(differs, new_med, medium)
