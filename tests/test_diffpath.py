"""Differentiable rendering (integrators/diffpath.py).

Three gates:
  1. PRIMAL PARITY: render_diff's film equals the production wavefront
     queue's (same counter-hash RNG stream keyed on (seed, item, nv),
     same advance semantics) at matched max_depth — so the detach=True
     plumbing provably does not perturb forward values.
  2. GRADIENT CORRECTNESS: jax.grad through the full estimator matches
     central finite differences of the primal on a constant-albedo
     parameter (eval-side parameter -> the detached estimator is exact
     for the fixed random stream).
  3. INVERSE RENDERING: recover the cbox red-wall albedo from a target
     image by gradient descent — the end-to-end capability the forward
     reference cannot offer.
"""
import dataclasses
import os

import numpy as np
import pytest

REF = '/root/reference/scenes'

_jax = pytest.importorskip('jax')
pytestmark = pytest.mark.skipif(
    _jax.default_backend() == 'tpu',
    reason='CPU-only (platform-independent estimator plumbing; keeps '
           'the TPU suite budget for perf/bias gates)')


def _cbox(res=32):
    from lajolla_tpu.scene.parser import parse_scene_to_builder
    from lajolla_tpu.scene.compile import compile_scene

    b = parse_scene_to_builder(f'{REF}/cbox/cbox.xml')
    b.camera.width = res
    b.camera.height = res
    return compile_scene(b), b.options


def _red_tex_id(scene):
    """Texture-table row of the red wall's constant reflectance."""
    tab = np.asarray(scene.tex_tab)
    const = tab[:, 2:5]
    red = np.nonzero(const[:, 0] > 3.0 * const[:, 1] + 1e-3)[0]
    assert len(red) == 1
    return int(red[0])


def test_primal_matches_wavefront_queue():
    import jax.numpy as jnp
    from lajolla_tpu.integrators.diffpath import render_diff
    from lajolla_tpu.integrators.path import _render_block_sc

    scene, opts = _cbox(32)
    opts = dataclasses.replace(opts, max_depth=4)
    spp, seed = 2, 5
    img_d = np.asarray(render_diff(scene, opts, seed=seed, spp=spp,
                                   depth=4))
    film, _, _ = _render_block_sc(scene, opts, seed, 0, spp, lanes=None)
    n = 32 * 32
    img_q = np.asarray(film)[:n].reshape(32, 32, 3) / spp
    assert np.isfinite(img_d).all()
    # un-jitted, the detach=True and detach=False step functions are
    # BIT-IDENTICAL on every lane (verified while landing this — the
    # detach plumbing is stop_gradients plus masked-branch sanitizing
    # only); under jit the extra selects change XLA's fusion choices,
    # so a few lanes drift by fp-rounding (~1e-4 relative max observed)
    np.testing.assert_allclose(img_d, img_q, rtol=1e-3, atol=1e-5)


def test_gradient_matches_finite_differences():
    import jax
    import jax.numpy as jnp
    from lajolla_tpu.integrators.diffpath import render_diff

    scene, opts = _cbox(16)
    opts = dataclasses.replace(opts, max_depth=4)
    tid = _red_tex_id(scene)

    def primal(s):
        s2 = dataclasses.replace(
            scene, tex_tab=scene.tex_tab.at[tid, 2:5].set(
                scene.tex_tab[tid, 2:5] * s))
        img = render_diff(s2, opts, seed=1, spp=2, depth=4)
        return jnp.mean(img)

    g = float(jax.grad(primal)(jnp.float32(1.0)))
    eps = 1e-2
    fd = (float(primal(jnp.float32(1.0 + eps))) -
          float(primal(jnp.float32(1.0 - eps)))) / (2 * eps)
    # same RNG stream on every evaluation -> the only fd error is the
    # scale nonlinearity of multi-bounce throughput, O(eps^2)
    assert g == pytest.approx(fd, rel=5e-3), (g, fd)
    assert g > 0  # brighter wall -> brighter image


def test_sharded_gradients_match():
    """Gradients through shard_map: an 8-device sample-DP render must
    give the same primal AND parameter gradient as single-device at
    equal total spp (the transpose all-reduces the replicated-param
    cotangents over the mesh automatically)."""
    import jax
    import jax.numpy as jnp
    from lajolla_tpu.integrators.diffpath import render_diff
    from lajolla_tpu.parallel.mesh import (default_mesh,
                                           render_diff_sharded)

    scene, opts = _cbox(16)
    opts = dataclasses.replace(opts, max_depth=4, samples_per_pixel=8)
    mesh = default_mesh()
    nd = mesh.devices.size

    def _scaled(s):
        return dataclasses.replace(scene, tex_tab=scene.tex_tab * s)

    def loss_sharded(s):
        return jnp.mean(render_diff_sharded(_scaled(s), opts, seed=3,
                                            mesh=mesh, depth=4))

    def loss_single(s):
        return jnp.mean(render_diff(_scaled(s), opts, seed=3,
                                    spp=8, depth=4))

    p_sh, g_sh = jax.value_and_grad(loss_sharded)(jnp.float32(1.0))
    p_1, g_1 = jax.value_and_grad(loss_single)(jnp.float32(1.0))
    assert nd == 8  # conftest virtual mesh
    assert float(p_sh) == pytest.approx(float(p_1), rel=1e-4)
    assert float(g_sh) == pytest.approx(float(g_1), rel=1e-3)


def _volpath2_scene(res=32):
    from lajolla_tpu.scene.parser import parse_scene_to_builder
    from lajolla_tpu.scene.compile import compile_scene

    b = parse_scene_to_builder(f'{REF}/volpath_test/volpath_test2.xml')
    b.camera.width = res
    b.camera.height = res
    return compile_scene(b), b.options


def test_volpath_diff_primal_matches_forward_driver():
    """render_volpath_diff reuses the production tracer + RNG; the
    detach plumbing must not perturb forward values."""
    from lajolla_tpu.integrators.diffpath import render_volpath_diff
    from lajolla_tpu.integrators.volpath import _render_volpath_simple_block

    scene, opts = _volpath2_scene(32)
    assert opts.vol_path_version == 2
    spp, seed = 4, 3
    img_d = np.asarray(render_volpath_diff(scene, opts, seed=seed,
                                           spp=spp))
    img_f = np.asarray(_render_volpath_simple_block(
        scene, opts, seed, 0, spp)).reshape(32, 32, 3) / spp
    np.testing.assert_allclose(img_d, img_f, rtol=1e-4, atol=1e-6)


def test_volpath1_gradient_matches_fd_exactly():
    """Version 1 is absorption-only with a deterministic hit distance —
    nothing is sampled from σ_a, so plain AD equals central finite
    differences to O(eps^2) on the same stream."""
    import jax
    import jax.numpy as jnp
    from lajolla_tpu.integrators.diffpath import render_volpath_diff
    from lajolla_tpu.integrators.media import MT_SA
    from lajolla_tpu.scene.parser import parse_scene_to_builder
    from lajolla_tpu.scene.compile import compile_scene

    b = parse_scene_to_builder(f'{REF}/volpath_test/volpath_test1.xml')
    b.camera.width = 16
    b.camera.height = 16
    scene, opts = compile_scene(b), b.options
    assert opts.vol_path_version == 1

    def primal(s):
        med = scene.med_tab.at[:, MT_SA:MT_SA + 3].mul(s)
        s2 = dataclasses.replace(scene, med_tab=med)
        return jnp.mean(render_volpath_diff(s2, opts, seed=1, spp=2))

    g = float(jax.grad(primal)(jnp.float32(1.0)))
    eps = 1e-2
    fd = (float(primal(jnp.float32(1.0 + eps))) -
          float(primal(jnp.float32(1.0 - eps)))) / (2 * eps)
    assert g == pytest.approx(fd, rel=5e-3), (g, fd)
    assert g < 0  # denser absorber -> darker image


def test_volpath2_gradient_unbiased():
    """Version 2 samples the free-flight distance FROM σ_t, so the
    detached gradient differs from a fixed-stream fd per realization;
    they agree only in expectation. Gate: detached grad vs central fd
    at matched spp (common random numbers) within MC noise."""
    import jax
    import jax.numpy as jnp
    from lajolla_tpu.integrators.diffpath import render_volpath_diff
    from lajolla_tpu.integrators.media import MT_SA

    scene, opts = _volpath2_scene(16)
    spp = 128

    def primal(s, seed):
        med = scene.med_tab.at[:, MT_SA:MT_SA + 6].mul(s)
        s2 = dataclasses.replace(scene, med_tab=med)
        return jnp.mean(render_volpath_diff(s2, opts, seed=seed,
                                            spp=spp))

    g = float(jax.grad(primal)(jnp.float32(1.0), 1))
    eps = 5e-2
    fd = (float(primal(jnp.float32(1.0 + eps), 1)) -
          float(primal(jnp.float32(1.0 - eps), 1))) / (2 * eps)
    assert g == pytest.approx(fd, rel=0.1), (g, fd)
    assert g != 0.0


def test_roughness_gradient_forward_mode():
    """Microfacet (RoughPlastic) roughness gradients on veach_mi via
    grad_fwd. Reverse mode on this scene class can NaN under XLA's
    optimizer (see grad_fwd docstring); forward mode is exact — gated
    here as finite across the roughness range and matching the
    deterministic pinned value at r=0.25."""
    import jax
    import jax.numpy as jnp
    from lajolla_tpu.integrators.diffpath import grad_fwd, render_diff
    import lajolla_tpu.scene.types as T

    from lajolla_tpu.scene.parser import parse_scene_to_builder
    from lajolla_tpu.scene.compile import compile_scene

    b = parse_scene_to_builder(f'{REF}/veach_mi/mi.xml')
    b.camera.width = 32
    b.camera.height = 24
    scene, opts = compile_scene(b), b.options
    opts = dataclasses.replace(opts, max_depth=3)
    mt = np.asarray(scene.mat_tab)
    mtex = mt[:, 2:15].astype(int)
    rp = np.nonzero(mt[:, 0].astype(int) == T.MAT_ROUGH_PLASTIC)[0]
    tid = int(mtex[rp[1], T.P_ROUGHNESS])

    def mean_lum(r):
        tt = scene.tex_tab.at[tid, 2:5].set(r)
        s2 = dataclasses.replace(scene, tex_tab=tt)
        return jnp.mean(render_diff(s2, opts, seed=4, spp=8, depth=3))

    for r in (0.05, 0.25, 0.7):
        g = grad_fwd(mean_lum, jnp.float32(r))
        assert np.isfinite(float(g)), r
    g25 = float(grad_fwd(mean_lum, jnp.float32(0.25)))
    # deterministic (fixed stream): pinned while landing the feature
    assert g25 == pytest.approx(-0.00561, rel=0.05), g25


def test_sigma_recovery():
    """Inverse volumetric rendering: recover the medium's absorption
    scale from a target image by gradient descent on the v2
    single-scattering estimator."""
    import jax
    import jax.numpy as jnp
    import optax
    from lajolla_tpu.integrators.diffpath import render_volpath_diff
    from lajolla_tpu.integrators.media import MT_SA

    scene, opts = _volpath2_scene(24)

    def render_with(s):
        med = scene.med_tab.at[:, MT_SA:MT_SA + 6].mul(s)
        return render_volpath_diff(
            dataclasses.replace(scene, med_tab=med), opts, seed=5,
            spp=16)

    target = render_with(jnp.float32(1.0))

    @jax.jit
    def loss_and_grad(s):
        return jax.value_and_grad(
            lambda s: jnp.mean((render_with(s) - target) ** 2))(s)

    s = jnp.float32(0.4)
    tx = optax.adam(0.05)
    ost = tx.init(s)
    l0 = float(loss_and_grad(s)[0])
    for _ in range(80):
        l, g = loss_and_grad(s)
        upd, ost = tx.update(g, ost)
        s = jnp.clip(s + upd, 0.05, 3.0)
    # deterministic (fixed stream): measured s = 0.9867, loss ratio
    # 1.5e-3 at 80 steps while landing this
    assert float(loss_and_grad(s)[0]) < 1e-2 * l0
    assert float(s) == pytest.approx(1.0, abs=0.05), float(s)


def test_albedo_recovery():
    import jax
    import jax.numpy as jnp
    import optax
    from lajolla_tpu.integrators.diffpath import render_diff

    scene, opts = _cbox(24)
    opts = dataclasses.replace(opts, max_depth=4)
    tid = _red_tex_id(scene)
    kd_true = jnp.asarray(scene.tex_tab[tid, 2:5])

    def render_with(kd):
        s2 = dataclasses.replace(scene,
                                 tex_tab=scene.tex_tab.at[tid, 2:5].set(kd))
        return render_diff(s2, opts, seed=9, spp=4, depth=4)

    target = render_with(kd_true)

    @jax.jit
    def loss_and_grad(kd):
        def loss(kd):
            return jnp.mean((render_with(kd) - target) ** 2)
        return jax.value_and_grad(loss)(kd)

    kd = jnp.full(3, 0.5, jnp.float32)
    tx = optax.adam(0.1)
    ost = tx.init(kd)
    l0 = float(loss_and_grad(kd)[0])
    for _ in range(40):
        l, g = loss_and_grad(kd)
        upd, ost = tx.update(g, ost)
        kd = jnp.clip(kd + upd, 0.0, 1.0)
    lN = float(loss_and_grad(kd)[0])
    assert lN < 1e-2 * l0, (l0, lN)   # measured ~700x drop in 40 steps
    np.testing.assert_allclose(np.asarray(kd), np.asarray(kd_true),
                               atol=0.02)
