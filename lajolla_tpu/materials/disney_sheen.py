"""DisneySheen: tinted Schlick-retro sheen lobe
(reference: materials/disney_sheen.inl)."""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, luminance, normalize, to_world
from lajolla_tpu.materials import SampleRec, flip_frame_if_needed
from lajolla_tpu.materials.common import PI, sample_cos_hemisphere, tex1, tex3
from lajolla_tpu.scene.types import P_BASE_COLOR, P_SHEEN_TINT


def sheen_color(base_color, sheen_tint):
    lum = luminance(base_color)
    c_tint = jnp.where(lum <= 0, jnp.ones(3),
                       base_color / jnp.maximum(lum, 1e-20))
    return (1.0 - sheen_tint) + sheen_tint * c_tint


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    base_color = tex3(scene, mat_id, P_BASE_COLOR, hit)
    sheen_tint = tex1(scene, mat_id, P_SHEEN_TINT, hit)
    h = normalize(dir_in + dir_out)
    n_dot_out = dot(frame[2], dir_out)
    c_sheen = sheen_color(base_color, sheen_tint)
    f = c_sheen * (1.0 - jnp.abs(dot(h, dir_out))) ** 5 * jnp.abs(n_dot_out)
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
