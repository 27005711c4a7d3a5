"""DisneyDiffuse: Burley diffuse + subsurface mix
(reference: materials/disney_diffuse.inl). NB the fork computes the
Schlick-style weights as (1 - cos^5), not (1 - cos)^5 — replicated
verbatim for output parity."""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, normalize, to_world
from lajolla_tpu.materials import SampleRec, flip_frame_if_needed
from lajolla_tpu.materials.common import PI, sample_cos_hemisphere, tex1, tex3
from lajolla_tpu.scene.types import P_BASE_COLOR, P_ROUGHNESS, P_SUBSURFACE


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    base_color = tex3(scene, mat_id, P_BASE_COLOR, hit)
    roughness = tex1(scene, mat_id, P_ROUGHNESS, hit)
    subsurface = tex1(scene, mat_id, P_SUBSURFACE, hit)

    h = normalize(dir_in + dir_out)
    h_dot_out = dot(h, dir_out)
    n_dot_in = dot(frame[2], dir_in)
    n_dot_out = dot(frame[2], dir_out)

    fd90 = 0.5 + 2.0 * roughness * h_dot_out * h_dot_out
    fd_in = 1.0 + (fd90 - 1.0) * (1.0 - n_dot_in ** 5)
    fd_out = 1.0 + (fd90 - 1.0) * (1.0 - n_dot_out ** 5)
    f_d = base_color * fd_in * fd_out * jnp.abs(n_dot_out) / PI

    fss90 = roughness * h_dot_out * h_dot_out
    fss_in = 1.0 + (fss90 - 1.0) * (1.0 - n_dot_in ** 5)
    fss_out = 1.0 + (fss90 - 1.0) * (1.0 - n_dot_out ** 5)
    f_ss = (1.25 * base_color *
            (fss_in * fss_out * (1.0 / jnp.maximum(
                jnp.abs(n_dot_in) + jnp.abs(n_dot_out), 1e-20) - 0.5) + 0.5) *
            jnp.abs(n_dot_out) / PI)

    f = (1.0 - subsurface) * f_d + subsurface * f_ss
    return jnp.where(below, 0.0, f)


def pdf(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    p = jnp.maximum(dot(frame[2], dir_out), 0.0) / PI
    return jnp.where(below, 0.0, p)


def sample(scene, mat_id, dir_in, hit, u2, w, adjoint):
    below = dot(hit.geometry_normal, dir_in) < 0
    frame = flip_frame_if_needed(hit.frame, dir_in)
    d = to_world(frame, sample_cos_hemisphere(u2))
    return SampleRec(dir_out=d, eta=jnp.float32(0.0),
                     roughness=jnp.float32(1.0), valid=~below)
