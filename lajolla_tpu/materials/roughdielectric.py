"""RoughDielectric: Walter et al. GGX rough glass
(reference: materials/roughdielectric.inl). Handles two-sided refraction
with the generalized half-vector, eta-adjoint correction, and
Fresnel-driven reflect/refract lobe choice."""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, normalize, to_local, to_world
from lajolla_tpu.core.math import safe_sqrt
from lajolla_tpu.materials import SampleRec
from lajolla_tpu.materials.common import (fresnel_dielectric, ggx_d,
                                          sample_visible_normals,
                                          smith_masking_gtr2, tex1, tex3)
from lajolla_tpu.scene.soa import fetch_mat
from lajolla_tpu.scene.types import P_AUX_COLOR, P_BASE_COLOR, P_ROUGHNESS


def _setup(scene, mat_id, dir_in, hit):
    """Shared: two-sided frame flip + directional eta
    (roughdielectric.inl:8-16)."""
    g_dot_in = dot(hit.geometry_normal, dir_in)
    frame = hit.frame
    flip = dot(frame[2], dir_in) * g_dot_in < 0
    frame = jnp.where(flip, -frame, frame)
    base_eta = fetch_mat(scene, mat_id).eta
    eta = jnp.where(g_dot_in > 0, base_eta, 1.0 / base_eta)
    roughness = jnp.clip(tex1(scene, mat_id, P_ROUGHNESS, hit), 0.01, 1.0)
    return frame, eta, roughness, g_dot_in


def _half_vector(dir_in, dir_out, eta, frame, reflect):
    h_r = normalize(dir_in + dir_out)
    h_t = normalize(dir_in + dir_out * eta)
    h = jnp.where(reflect, h_r, h_t)
    return jnp.where(dot(h, frame[2]) < 0, -h, h)


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    frame, eta, roughness, g_dot_in = _setup(scene, mat_id, dir_in, hit)
    reflect = g_dot_in * dot(hit.geometry_normal, dir_out) > 0
    ks = tex3(scene, mat_id, P_BASE_COLOR, hit)
    kt = tex3(scene, mat_id, P_AUX_COLOR, hit)
    h = _half_vector(dir_in, dir_out, eta, frame, reflect)

    h_dot_in = dot(h, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)
    D = ggx_d(dot(frame[2], h), roughness)
    G = (smith_masking_gtr2(to_local(frame, dir_in), roughness) *
         smith_masking_gtr2(to_local(frame, dir_out), roughness))
    n_dot_in_abs = jnp.abs(dot(frame[2], dir_in))

    f_refl = ks * (F * D * G) / jnp.maximum(4.0 * n_dot_in_abs, 1e-20)

    # Non-reciprocal eta factor (roughdielectric.inl:57-64): radiance
    # transport (camera→light, the reference's TO_LIGHT default) carries
    # 1/eta^2; the adjoint (importance transport) does not. `adjoint` is a
    # static Python bool.
    ef = 1.0 if adjoint else 1.0 / (eta * eta)
    h_dot_out = dot(h, dir_out)
    sqrt_denom = h_dot_in + eta * h_dot_out
    f_trans = kt * (ef * (1.0 - F) * D * G * eta * eta *
                    jnp.abs(h_dot_out * h_dot_in)) / \
        jnp.maximum(n_dot_in_abs * sqrt_denom * sqrt_denom, 1e-20)

    return jnp.where(reflect, f_refl, f_trans)


def pdf(scene, mat_id, dir_in, dir_out, hit, adjoint):
    frame, eta, roughness, g_dot_in = _setup(scene, mat_id, dir_in, hit)
    reflect = g_dot_in * dot(hit.geometry_normal, dir_out) > 0
    h = _half_vector(dir_in, dir_out, eta, frame, reflect)
    h_dot_in = dot(h, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)
    D = ggx_d(dot(h, frame[2]), roughness)
    G_in = smith_masking_gtr2(to_local(frame, dir_in), roughness)
    n_dot_in = dot(frame[2], dir_in)

    p_refl = (F * D * G_in) / jnp.maximum(4.0 * jnp.abs(n_dot_in), 1e-20)
    h_dot_out = dot(h, dir_out)
    sqrt_denom = h_dot_in + eta * h_dot_out
    dh_dout = eta * eta * h_dot_out / jnp.maximum(sqrt_denom * sqrt_denom,
                                                  1e-20)
    p_trans = (1.0 - F) * D * G_in * jnp.abs(
        dh_dout * h_dot_in / jnp.where(n_dot_in == 0, 1.0, n_dot_in))
    return jnp.where(reflect, p_refl, p_trans)


def sample(scene, mat_id, dir_in, hit, u2, w, adjoint):
    frame, eta, roughness, g_dot_in = _setup(scene, mat_id, dir_in, hit)
    alpha = roughness * roughness
    local_dir_in = to_local(frame, dir_in)
    local_h = sample_visible_normals(local_dir_in, alpha, u2)
    h = to_world(frame, local_h)
    h = jnp.where(dot(h, frame[2]) < 0, -h, h)

    h_dot_in = dot(h, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)

    reflected = normalize(-dir_in + 2.0 * dot(dir_in, h) * h)

    h_dot_out_sq = 1.0 - (1.0 - h_dot_in * h_dot_in) / (eta * eta)
    tir = h_dot_out_sq <= 0
    h_flip = jnp.where(h_dot_in < 0, -h, h)
    h_dot_out = safe_sqrt(h_dot_out_sq)
    refracted = -dir_in / eta + (jnp.abs(h_dot_in) / eta - h_dot_out) * h_flip

    take_refl = w <= F
    return SampleRec(
        dir_out=jnp.where(take_refl, reflected, refracted),
        eta=jnp.where(take_refl, 0.0, eta),
        roughness=roughness,
        valid=take_refl | ~tir)
