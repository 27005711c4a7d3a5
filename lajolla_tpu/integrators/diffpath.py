"""Differentiable path tracing (beyond the reference).

The reference is a forward C++ renderer; gradients are out of its
scope. Here the TPU-native design pays off: the scalar advance step
(`path._advance_lane`) is a pure JAX function, so a fixed-depth
`lax.scan` over it yields a renderer that reverse-mode differentiates
end-to-end with `jax.grad` — scene parameters (albedos, roughness,
light intensity, textures) get exact detached-estimator gradients with
no extra code per material.

Estimator = the production wavefront estimator with two deviations,
both standard for differentiable rendering:

  1. Fixed bounce budget (`depth` scan steps, no persistent queue):
     reverse-mode AD cannot transpose `lax.while_loop`, and a scan
     keeps the saved-primal memory proportional to depth. Paths still
     die by Russian roulette; survivors at the budget are truncated
     exactly like a `max_depth = depth` forward render.
  2. Detached sampling (`_advance_lane(detach=True)`): geometry,
     sampled directions, sampling pdfs, MIS weights and RR are wrapped
     in stop_gradient; BSDF evaluations and emission stay attached.
     Unbiased for eval-side parameters (see _advance_lane docstring);
     parameters that move visibility discontinuities (vertex
     positions) get the usual interior-term-only gradient.

Primal values are IDENTICAL to a `_render_block_sc` render with the
same seed and `max_depth` (same counter-hash RNG stream keyed on
(seed, item, nv) — gated by tests/test_diffpath.py), so everything the
forward suite validates transfers.

Typical use (recover a material parameter from a target image):

    def loss(kd):
        s = scene.replace(tex_data=pack(kd))
        img = render_diff(s, options, spp=4, depth=4)
        return jnp.mean((img - target) ** 2)
    g = jax.grad(loss)(kd0)
"""

from functools import partial

import jax
import jax.numpy as jnp

from lajolla_tpu.integrators.path import (_GOLD, _advance_lane, _hash_u01,
                                          _pcg_hash, _primary_hash)


@partial(jax.jit, static_argnames=('options', 'spp', 'depth'))
def render_diff(scene, options, seed=0, spp=4, depth=6, s0=0):
    """Differentiable render: (h, w, 3) film MEAN over `spp` samples
    with a fixed `depth`-bounce budget. Differentiable wrt any float
    leaf of `scene` that parameterizes shading or emission. `s0` offsets
    the sample indices (work items s0*n ..) so a mesh of chips can split
    the sample axis while reproducing the exact single-chip RNG streams
    (parallel/mesh.py render_diff_sharded)."""
    w, h = scene.meta.width, scene.meta.height
    n = w * h
    lanes = n * spp
    su = jnp.uint32(seed)
    kidx = (jnp.arange(8, dtype=jnp.uint32) * jnp.uint32(_GOLD) +
            jnp.uint32(_GOLD))[None, :]                    # (1, 8)

    item0 = jnp.arange(lanes, dtype=jnp.int32) + \
        jnp.asarray(s0, jnp.int32) * n                     # item % n = pixel
    _pix, org0, d0 = _primary_hash(scene, options, item0, su)
    z = jnp.zeros(lanes, jnp.float32)
    st = (item0, jnp.full(lanes, 2, jnp.int32), org0, d0,
          jnp.full(lanes, 0.25 / max(w, h), jnp.float32), z,
          jnp.ones((lanes, 3), jnp.float32),
          jnp.zeros((lanes, 3), jnp.float32),
          jnp.ones(lanes, jnp.float32), z, org0,
          jnp.zeros(lanes, jnp.bool_))

    def body(carry, _):
        st, Lf = carry
        hb = _pcg_hash(st[0].astype(jnp.uint32) ^
                       _pcg_hash(st[1].astype(jnp.uint32) ^ su))
        uN = _hash_u01(_pcg_hash(hb[:, None] + kidx))      # (lanes, 8)
        nst, died = jax.vmap(
            lambda u, *s: _advance_lane(scene, options, s, u,
                                        detach=True))(uN, *st)
        # latch radiance at death (no regeneration: one path per lane)
        Lf = jnp.where(died[:, None], nst[7], Lf)
        done = nst[11] | died
        return (nst[:11] + (done,), Lf), None

    (st, Lf), _ = jax.lax.scan(body, (st, jnp.zeros((lanes, 3))),
                               None, length=depth)
    # budget-truncated survivors contribute their accumulated radiance
    Lf = jnp.where(st[11][:, None], Lf, st[7])
    # whole-sample NaN/Inf exclusion (render.cpp:140-143 parity)
    Lf = jnp.where(jnp.all(jnp.isfinite(Lf), axis=-1)[:, None], Lf, 0.0)
    return Lf.reshape(spp, n, 3).sum(0).reshape(h, w, 3) / spp


@partial(jax.jit, static_argnames=('options', 'spp'))
def render_volpath_diff(scene, options, seed=0, spp=4):
    """Differentiable VOLUMETRIC render for the loop-free single-
    scattering estimators (vol_path_version 1/2): (h, w, 3) film mean,
    differentiable wrt medium (σ_a, σ_s), phase and emission parameters
    of the scene pytree. Version 1 is closed-form (nothing is sampled
    from the differentiated parameters — plain AD is exact); version 2
    runs `volpath2_trace_one(detach=True)` (detached free-flight
    sampling; see its docstring). Mirrors the production
    `_render_volpath_simple_block` RNG exactly (threefry fold_in per
    (pixel, sample)), so primals match the forward driver bit-for-bit
    modulo XLA fusion."""
    from functools import partial as _p

    from lajolla_tpu.integrators.volpath import (volpath1_trace_one,
                                                 volpath2_trace_one)
    w, h = scene.meta.width, scene.meta.height
    n = w * h
    root = jax.random.PRNGKey(seed)
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % w).astype(jnp.int32)
    py = (pix // w).astype(jnp.int32)
    pixel_keys = jax.vmap(jax.random.fold_in, (None, 0))(root, pix)
    tracer = volpath1_trace_one if options.vol_path_version == 1 \
        else _p(volpath2_trace_one, detach=True)
    trace = jax.vmap(tracer, in_axes=(None, None, 0, 0, 0))

    def body(img, i):
        keys = jax.vmap(jax.random.fold_in, (0, None))(
            pixel_keys, i.astype(jnp.uint32))
        L = trace(scene, options, px, py, keys)
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        return img + L, None

    img, _ = jax.lax.scan(body, jnp.zeros((n, 3), jnp.float32),
                          jnp.arange(spp))
    return (img / spp).reshape(h, w, 3)
