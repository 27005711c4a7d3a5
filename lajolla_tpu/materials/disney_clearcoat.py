"""DisneyClearcoat: GTR1-style lobe with fixed eta-1.5 Schlick Fresnel
and fixed 0.25-roughness masking (reference: materials/disney_clearcoat.inl;
the masking calls smith_masking_gtr2 with roughness 0.5 → alpha 0.25)."""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, normalize, to_local, to_world
from lajolla_tpu.core.math import safe_sqrt
from lajolla_tpu.materials import SampleRec, flip_frame_if_needed
from lajolla_tpu.materials.common import PI, TWO_PI, smith_masking_gtr2, tex1
from lajolla_tpu.scene.types import P_CLEARCOAT_GLOSS


def _schlick_f(h, dir_out):
    eta = 1.5
    r0 = (eta - 1.0) ** 2 / (eta + 1.0) ** 2
    return r0 + (1.0 - r0) * (1.0 - jnp.abs(dot(h, dir_out))) ** 5


def _dc_ref(clearcoat_gloss, hlz2):
    """Verbatim reference formula (disney_clearcoat.inl:10-16)."""
    a = (1.0 - clearcoat_gloss) * 0.1 + clearcoat_gloss * 0.001
    a2 = a * a
    return (a2 - 1.0) / (PI * jnp.log(a2) * (1.0 + (a2 - 1.0) * hlz2))


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    h = normalize(dir_in + dir_out)
    n_dot_h = dot(frame[2], h)
    n_dot_in = dot(frame[2], dir_in)
    invalid = below | (n_dot_h <= 0)
    gloss = tex1(scene, mat_id, P_CLEARCOAT_GLOSS, hit)
    F = _schlick_f(h, dir_out)
    D = _dc_ref(gloss, n_dot_h * n_dot_h)
    G = (smith_masking_gtr2(to_local(frame, dir_in), 0.5) *
         smith_masking_gtr2(to_local(frame, dir_out), 0.5))
    val = F * D * G / jnp.maximum(4.0 * jnp.abs(n_dot_in), 1e-20)
    return jnp.where(invalid, 0.0, jnp.full(3, 1.0) * val)


def pdf(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    h = normalize(dir_in + dir_out)
    n_dot_h = dot(frame[2], h)
    gloss = tex1(scene, mat_id, P_CLEARCOAT_GLOSS, hit)
    D = _dc_ref(gloss, n_dot_h * n_dot_h)
    p = D * jnp.abs(n_dot_h) / jnp.maximum(
        4.0 * jnp.abs(dot(h, dir_out)), 1e-20)
    return jnp.where(below, 0.0, p)


def sample(scene, mat_id, dir_in, hit, u2, w, adjoint):
    below = dot(hit.geometry_normal, dir_in) < 0
    frame = flip_frame_if_needed(hit.frame, dir_in)
    gloss = tex1(scene, mat_id, P_CLEARCOAT_GLOSS, hit)
    a = (1.0 - gloss) * 0.1 + gloss * 0.001
    a2 = a * a
    cos_h = safe_sqrt((1.0 - a2 ** (1.0 - u2[0])) / (1.0 - a2))
    sin_h = safe_sqrt(1.0 - cos_h * cos_h)
    azimuth = TWO_PI * u2[1]
    local_h = normalize(jnp.stack([sin_h * jnp.cos(azimuth),
                                   sin_h * jnp.sin(azimuth), cos_h]))
    h = to_world(frame, local_h)
    reflected = normalize(-dir_in + 2.0 * dot(dir_in, h) * h)
    return SampleRec(dir_out=reflected, eta=jnp.float32(0.0),
                     roughness=jnp.float32(1.0), valid=~below)
