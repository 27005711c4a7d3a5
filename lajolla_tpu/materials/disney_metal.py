"""DisneyMetal: anisotropic GTR2 + Smith GGX with Schlick base-color
Fresnel (reference: materials/disney_metal.inl)."""

import jax.numpy as jnp

from lajolla_tpu.core.math import dot, normalize, to_local, to_world
from lajolla_tpu.materials import SampleRec, flip_frame_if_needed
from lajolla_tpu.materials.common import (gtr2_aniso,
                                          sample_visible_normals_aniso,
                                          smith_g_ggx_aniso, tex1, tex3)
from lajolla_tpu.scene.types import P_ANISOTROPIC, P_BASE_COLOR, P_ROUGHNESS

A_MIN = 1e-4


def aniso_alphas(roughness, anisotropic):
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropic)
    ax = jnp.maximum(A_MIN, roughness * roughness / aspect)
    ay = jnp.maximum(A_MIN, roughness * roughness * aspect)
    return ax, ay


def eval(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    base_color = tex3(scene, mat_id, P_BASE_COLOR, hit)
    roughness = jnp.clip(tex1(scene, mat_id, P_ROUGHNESS, hit), 0.01, 1.0)
    anisotropic = tex1(scene, mat_id, P_ANISOTROPIC, hit)

    h = normalize(dir_in + dir_out)
    h_dot_out = dot(h, dir_out)
    Fm = base_color + (1.0 - base_color) * (1.0 - jnp.abs(h_dot_out)) ** 5
    ax, ay = aniso_alphas(roughness, anisotropic)
    Dm = gtr2_aniso(to_local(frame, h), ax, ay)
    Gin = smith_g_ggx_aniso(to_local(frame, dir_in), ax, ay)
    Gout = smith_g_ggx_aniso(to_local(frame, dir_out), ax, ay)
    f = Fm * Dm * Gin * Gout / jnp.maximum(
        4.0 * jnp.abs(dot(dir_in, frame[2])), 1e-20)
    return jnp.where(below, 0.0, f)


def pdf(scene, mat_id, dir_in, dir_out, hit, adjoint):
    below = (dot(hit.geometry_normal, dir_in) < 0) | \
            (dot(hit.geometry_normal, dir_out) < 0)
    frame = flip_frame_if_needed(hit.frame, dir_in)
    roughness = jnp.clip(tex1(scene, mat_id, P_ROUGHNESS, hit), 0.01, 1.0)
    anisotropic = tex1(scene, mat_id, P_ANISOTROPIC, hit)
    h = normalize(dir_in + dir_out)
    ax, ay = aniso_alphas(roughness, anisotropic)
    Dm = gtr2_aniso(to_local(frame, h), ax, ay)
    Gin = smith_g_ggx_aniso(to_local(frame, dir_in), ax, ay)
    p = Dm * Gin / jnp.maximum(4.0 * jnp.abs(dot(dir_in, frame[2])), 1e-20)
    return jnp.where(below, 0.0, p)


def sample(scene, mat_id, dir_in, hit, u2, w, adjoint):
    below = dot(hit.geometry_normal, dir_in) < 0
    frame = flip_frame_if_needed(hit.frame, dir_in)
    roughness = jnp.clip(tex1(scene, mat_id, P_ROUGHNESS, hit), 0.01, 1.0)
    anisotropic = tex1(scene, mat_id, P_ANISOTROPIC, hit)
    ax, ay = aniso_alphas(roughness, anisotropic)
    local_dir_in = to_local(frame, dir_in)
    local_h = sample_visible_normals_aniso(local_dir_in, ax, ay, u2)
    h = to_world(frame, local_h)
    reflected = normalize(-dir_in + 2.0 * dot(dir_in, h) * h)
    return SampleRec(dir_out=reflected, eta=jnp.float32(0.0),
                     roughness=roughness, valid=~below)
