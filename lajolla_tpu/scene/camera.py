"""Pinhole camera + pixel-filter importance sampling (device side).

Replicates sample_primary (src/camera.cpp:23-47) and the three pixel
filters (src/filters/{box,tent,gaussian}.inl). Filter *importance
sampling* (not splatting) means every film sample has weight 1 and pixels
stay write-disjoint — the property that makes the film a pure mean and
the multi-chip reduction a single psum (design note src/filter.h:7-29).
"""

import jax.numpy as jnp

from lajolla_tpu.core.transform import xform_point, xform_vector
from lajolla_tpu.core.math import normalize
from lajolla_tpu.scene.types import FILTER_BOX, FILTER_TENT, FILTER_GAUSSIAN

TWO_PI = 6.283185307179586


def sample_filter(filter_type, filter_param, u):
    """u: (2,) uniforms → pixel-space offset from pixel center."""
    if filter_type == FILTER_BOX:
        return (2.0 * u - 1.0) * (filter_param / 2.0)
    if filter_type == FILTER_TENT:
        h = filter_param / 2.0
        def warp(r):
            return jnp.where(r < 0.5,
                             h * (jnp.sqrt(2.0 * r) - 1.0),
                             h * (1.0 - jnp.sqrt(jnp.maximum(
                                 1.0 - 2.0 * (r - 0.5), 0.0))))
        return jnp.stack([warp(u[0]), warp(u[1])])
    if filter_type == FILTER_GAUSSIAN:
        r = filter_param * jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[0], 1e-8)))
        return jnp.stack([r * jnp.cos(TWO_PI * u[1]),
                          r * jnp.sin(TWO_PI * u[1])])
    raise ValueError(f"unknown filter type {filter_type}")


def sample_primary(scene, options, px, py, u_filter):
    """Camera ray through pixel (px, py) with filter-sampled subpixel
    offset. px/py are integer pixel coords (scalars; vmapped by callers).
    Returns (org, dir)."""
    offset = sample_filter(options.filter_type, options.filter_param, u_filter)
    w = scene.meta.width
    h = scene.meta.height
    x = (px + 0.5 + offset[0]) / w
    y = (py + 0.5 + offset[1]) / h
    pt = xform_point(scene.sample_to_cam, jnp.stack([x, y, jnp.zeros_like(x)]))
    dir_cam = normalize(pt)
    org = scene.cam_to_world[:3, 3]
    d = normalize(xform_vector(scene.cam_to_world, dir_cam))
    return org, d
