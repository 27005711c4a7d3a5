"""Lambertian BSDF (reference: materials/lambertian.inl)."""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, to_world
from lajolla_tpu.materials import SampleRec, flip_frame_if_needed
from lajolla_tpu.materials.common import PI, sample_cos_hemisphere, tex3
from lajolla_tpu.scene.types import P_BASE_COLOR


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    refl = tex3(scene, mat_id, P_BASE_COLOR, hit)
    f = jnp.maximum(dot(frame[2], dir_out), 0.0) * refl / PI
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
