"""Device-side texture evaluation (constant / image-mipmap / checkerboard).

Replaces eval(texture, uv, footprint, pool) (src/texture.h:108-154) and
the mipmap lookups (src/mipmap.h:52-88). Image lookups are trilinear:
two bilinear taps on adjacent mip levels, each tap = 4 gathers into the
single flattened texdata array. Per-ray scalar style; callers vmap.
"""

import jax.numpy as jnp

from lajolla_tpu.scene.soa import fetch_tex
from lajolla_tpu.scene.types import TEX_CONSTANT, TEX_IMAGE, TEX_CHECKERBOARD, MAX_MIP_LEVELS


def _bilinear(scene, img_id, level, u, v):
    off = scene.mip_offset[img_id, level]
    w = scene.mip_w[img_id, level]
    h = scene.mip_h[img_id, level]
    x = u * w - 0.5
    y = v * h - 0.5
    xf = jnp.floor(x).astype(jnp.int32)
    yf = jnp.floor(y).astype(jnp.int32)
    uo = x - xf
    vo = y - yf
    x0 = jnp.mod(xf, w)
    y0 = jnp.mod(yf, h)
    x1 = jnp.mod(xf + 1, w)
    y1 = jnp.mod(yf + 1, h)
    t00 = scene.texdata[off + y0 * w + x0]
    t01 = scene.texdata[off + y1 * w + x0]
    t10 = scene.texdata[off + y0 * w + x1]
    t11 = scene.texdata[off + y1 * w + x1]
    return (t00 * (1 - uo) * (1 - vo) + t01 * (1 - uo) * vo +
            t10 * uo * (1 - vo) + t11 * uo * vo)


def lookup_trilinear(scene, img_id, u, v, level):
    """Trilinear mipmap lookup with fractional level (mipmap.h:76-88)."""
    nlev = scene.mip_levels[img_id]
    level = jnp.clip(level, 0.0, (nlev - 1).astype(jnp.float32))
    fl = jnp.floor(level).astype(jnp.int32)
    cl = jnp.minimum(fl + 1, nlev - 1)
    t = level - fl
    lo = _bilinear(scene, img_id, fl, u, v)
    hi = _bilinear(scene, img_id, cl, u, v)
    return lo * (1 - t) + hi * t


def image_mip_level(scene, img_id, uvscale, footprint):
    """log2 footprint → fractional mip level (texture.h:127-134)."""
    w0 = scene.mip_w[img_id, 0]
    h0 = scene.mip_h[img_id, 0]
    scaled = (jnp.maximum(w0, h0).astype(jnp.float32) *
              jnp.maximum(uvscale[0], uvscale[1]) * footprint)
    return jnp.log2(jnp.maximum(scaled, 1e-8))


def eval_texture(scene, tex_id, uv, footprint):
    """Evaluate texture descriptor tex_id at uv → (3,) RGB. Scalar params
    read channel 0. footprint ≈ du/dx for mip selection."""
    tex = fetch_tex(scene, tex_id)
    kind = tex.kind
    out = tex.const
    local_uv = jnp.mod(uv * tex.uvscale + tex.uvoffset, 1.0)

    if TEX_CHECKERBOARD in scene.meta.texture_types_present:
        xi = 2 * jnp.mod((local_uv[0] * 2).astype(jnp.int32), 2) - 1
        yi = 2 * jnp.mod((local_uv[1] * 2).astype(jnp.int32), 2) - 1
        checker = jnp.where(xi * yi == 1, tex.const, tex.color1)
        out = jnp.where(kind == TEX_CHECKERBOARD, checker, out)

    if scene.meta.has_image_textures:
        img_id = tex.image_id
        level = image_mip_level(scene, img_id, tex.uvscale, footprint)
        img_val = lookup_trilinear(scene, img_id, local_uv[0], local_uv[1],
                                   level)
        out = jnp.where(kind == TEX_IMAGE, img_val, out)

    return out


def eval_texture_scalar(scene, tex_id, uv, footprint):
    return eval_texture(scene, tex_id, uv, footprint)[0]
