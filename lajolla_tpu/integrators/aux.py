"""Auxiliary debug integrators: depth / shadingNormal / meanCurvature /
rayDifferential / mipmapLevel (reference render.cpp:12-69).

Deterministic pixel-center rays, one primary intersection, vmapped over
the full pixel grid — the minimal end-to-end slice proving
scene → device → image.
"""

import jax
import jax.numpy as jnp

from lajolla_tpu.core.math import length
from lajolla_tpu.dtypes import intersection_eps
from lajolla_tpu.scene.camera import sample_primary
from lajolla_tpu.scene.geometry import intersect_scene
from lajolla_tpu.scene.texeval import image_mip_level
from lajolla_tpu.scene.types import TEX_IMAGE, P_BASE_COLOR


def init_ray_diff_spread(w, h):
    """init_ray_differential (ray.h:35-37)."""
    return 0.25 / max(w, h)


def _pixel(scene, options, px, py, mode):
    org, d = sample_primary(scene, options, px.astype(jnp.float32),
                            py.astype(jnp.float32),
                            jnp.array([0.5, 0.5]))  # box offset 0 at center
    hit = intersect_scene(scene, org, d, 0.0, jnp.inf, need_aux=True)
    dist = length(hit.position - org)
    w, h = scene.meta.width, scene.meta.height
    spread = init_ray_diff_spread(w, h)
    radius = spread * dist  # transfer() from radius 0

    if mode == 'depth':
        color = jnp.full(3, dist)
    elif mode == 'shadingNormal':
        color = hit.frame[2]
    elif mode == 'meanCurvature':
        color = jnp.full(3, hit.mean_curvature)
    elif mode == 'rayDifferential':
        # render.cpp:41 reads ray_diff.radius AFTER intersect() — which
        # never mutates the differential (intersection.cpp:54 stores the
        # transferred radius on the vertex instead), so the reference's
        # radius channel is identically the init value 0. Replicated.
        color = jnp.array([0.0, spread, 0.0])
    elif mode == 'mipmapLevel':
        mat = jnp.maximum(hit.material_id, 0)
        tex_id = scene.mat_tex[mat, P_BASE_COLOR]
        is_img = scene.tex_kind[tex_id] == TEX_IMAGE
        footprint = radius / jnp.maximum(hit.inv_uv_size, 1e-20)
        if scene.meta.has_image_textures:
            level = image_mip_level(scene, scene.tex_image[tex_id],
                                    scene.tex_uvscale[tex_id], footprint)
        else:
            level = 0.0
        color = jnp.where(is_img, jnp.full(3, level), jnp.zeros(3))
    else:
        raise ValueError(mode)
    return jnp.where(hit.valid, color, jnp.zeros(3))


def render_aux(scene, options):
    w, h = scene.meta.width, scene.meta.height
    xs = jnp.arange(w, dtype=jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    px, py = jnp.meshgrid(xs, ys)  # (h, w)
    f = lambda x, y: _pixel(scene, options, x, y, options.integrator)
    img = jax.vmap(jax.vmap(f))(px, py)
    return img
