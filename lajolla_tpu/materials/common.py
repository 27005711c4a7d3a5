"""Shared BSDF helpers: frames, cosine hemisphere, microfacet math.

Ports the *math* of src/microfacet.h and the shared anisotropic GGX
helpers (materials/disney_metal.inl:3-50) into branch-free jnp.
"""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, normalize, safe_sqrt, to_world
from lajolla_tpu.scene.soa import fetch_mat
from lajolla_tpu.scene.texeval import eval_texture

PI = 3.141592653589793
TWO_PI = 6.283185307179586


def tex3(scene, mat_id, slot, hit):
    """Evaluate a spectrum parameter slot at the hit."""
    return eval_texture(scene, fetch_mat(scene, mat_id).tex[slot], hit.uv,
                        hit.footprint)


def tex1(scene, mat_id, slot, hit):
    return tex3(scene, mat_id, slot, hit)[0]


def sample_cos_hemisphere(u):
    """material.cpp:4-11."""
    phi = TWO_PI * u[0]
    tmp = jnp.sqrt(jnp.clip(1.0 - u[1], 0.0, 1.0))
    return jnp.stack([jnp.cos(phi) * tmp, jnp.sin(phi) * tmp,
                      jnp.sqrt(jnp.clip(u[1], 0.0, 1.0))])


# --- Fresnel ---------------------------------------------------------------

def schlick_fresnel_scalar(f0, cos_theta):
    """microfacet.h:23-27 (works for spectrum f0 too via broadcasting)."""
    c = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * c ** 5


def fresnel_dielectric(n_dot_i, eta):
    """Exact dielectric Fresnel; cos of incident angle may be negative
    (microfacet.h:42-56 takes |n_dot_i| into the rs/rp form). Relative IOR
    eta = n_t/n_i. Returns 1 on total internal reflection."""
    n_dot_t_sq = 1.0 - (1.0 - n_dot_i * n_dot_i) / (eta * eta)
    tir = n_dot_t_sq < 0.0
    n_dot_t = safe_sqrt(n_dot_t_sq)
    c = jnp.abs(n_dot_i)
    rs = (c - eta * n_dot_t) / (c + eta * n_dot_t)
    rp = (eta * c - n_dot_t) / (eta * c + n_dot_t)
    F = (rs * rs + rp * rp) / 2.0
    return jnp.where(tir, 1.0, F)


# --- Isotropic GGX (GTR2) ----------------------------------------------------

def ggx_d(n_dot_h, roughness):
    """GTR2 NDF (microfacet.h:58-67)."""
    alpha = roughness * roughness
    a2 = alpha * alpha
    t = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * t * t, 1e-20)


def smith_masking_gtr2(v_local, roughness):
    """Smith masking G1 (microfacet.h:75-81); v_local in shading frame."""
    alpha = roughness * roughness
    a2 = alpha * alpha
    v2 = v_local * v_local
    lam = (-1.0 + jnp.sqrt(1.0 + (v2[0] * a2 + v2[1] * a2) /
                           jnp.maximum(v2[2], 1e-20))) / 2.0
    return 1.0 / (1.0 + lam)


def sample_visible_normals(local_dir_in, alpha, u):
    """Heitz 2018 VNDF sampling, isotropic (microfacet.h:85-114).
    local_dir_in must be in the shading frame. Returns half-vector (local).
    """
    flip = local_dir_in[2] < 0
    d = jnp.where(flip, -local_dir_in, local_dir_in)
    hemi_dir_in = normalize(
        jnp.stack([alpha * d[0], alpha * d[1], d[2]]))
    r = jnp.sqrt(u[0])
    phi = TWO_PI * u[1]
    t1 = r * jnp.cos(phi)
    t2 = r * jnp.sin(phi)
    s = (1.0 + hemi_dir_in[2]) / 2.0
    t2 = (1.0 - s) * safe_sqrt(1.0 - t1 * t1) + s * t2
    disk_n = jnp.stack([t1, t2, safe_sqrt(1.0 - t1 * t1 - t2 * t2)])
    # build frame around hemi_dir_in
    from lajolla_tpu.core.math import make_frame
    fr = make_frame(hemi_dir_in)
    hemi_n = to_world(fr, disk_n)
    h = normalize(jnp.stack([alpha * hemi_n[0], alpha * hemi_n[1],
                             jnp.maximum(hemi_n[2], 0.0)]))
    return jnp.where(flip, -h, h)


# --- Anisotropic GGX (disney_metal.inl:3-50) ---------------------------------

def smith_g_ggx_aniso(v_local, ax, ay):
    v2 = v_local * v_local
    lam = (-1.0 + jnp.sqrt(1.0 + (v2[0] * ax * ax + v2[1] * ay * ay) /
                           jnp.maximum(v2[2], 1e-20))) / 2.0
    return 1.0 / (1.0 + lam)


def gtr2_aniso(h_local, ax, ay):
    t = (h_local[0] * h_local[0] / (ax * ax) +
         h_local[1] * h_local[1] / (ay * ay) + h_local[2] * h_local[2])
    return 1.0 / jnp.maximum(PI * ax * ay * t * t, 1e-20)


def sample_visible_normals_aniso(local_dir_in, ax, ay, u):
    """Heitz VNDF, anisotropic (disney_metal.inl:21-50)."""
    flip = local_dir_in[2] < 0
    d = jnp.where(flip, -local_dir_in, local_dir_in)
    hemi_dir_in = normalize(jnp.stack([ax * d[0], ay * d[1], d[2]]))
    r = jnp.sqrt(u[0])
    phi = TWO_PI * u[1]
    t1 = r * jnp.cos(phi)
    t2 = r * jnp.sin(phi)
    s = (1.0 + hemi_dir_in[2]) / 2.0
    t2 = (1.0 - s) * safe_sqrt(1.0 - t1 * t1) + s * t2
    disk_n = jnp.stack([t1, t2, safe_sqrt(1.0 - t1 * t1 - t2 * t2)])
    from lajolla_tpu.core.math import make_frame
    fr = make_frame(hemi_dir_in)
    hemi_n = to_world(fr, disk_n)
    h = normalize(jnp.stack([ax * hemi_n[0], ay * hemi_n[1],
                             jnp.maximum(hemi_n[2], 0.0)]))
    return jnp.where(flip, -h, h)
