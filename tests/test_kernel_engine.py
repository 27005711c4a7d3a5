"""Megakernel engine semantics vs the general scalar wavefront engine.

The fused Pallas megakernel (integrators/path_megakernel.py) only runs
compiled on TPU, but its estimator must match the general engine
(integrators/path.py) — same counter-hash RNG stream, same advance
semantics. Here it runs in Pallas interpreter mode on the CPU fixture
and is compared statistically against the scalar engine on downscaled
copies of the two reference scenes it accelerates: cbox (Lambertian,
mesh lights) and veach_mi (RoughPlastic switch, sphere geometry, sphere
lights with cone sampling — shapes/sphere.inl:156-230).
"""

import dataclasses
import os

import numpy as np
import pytest

SCENES = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                      'reference', 'scenes')
REF = '/root/reference/scenes'


def _render_both(scene_path, w, h, spp, seed=0):
    import lajolla_tpu.integrators.path_megakernel as MK
    import lajolla_tpu.integrators.path as P
    from lajolla_tpu.scene.parser import parse_scene

    scene, options = parse_scene(scene_path)
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=w, height=h))
    assert MK.BLOCK % (w * h) == 0 or (w * h) % MK.BLOCK == 0
    old = MK.INTERPRET
    MK.INTERPRET = True
    try:
        img_k = np.asarray(MK.render_fused(scene, options, seed, 0,
                                           spp)) / spp
    finally:
        MK.INTERPRET = old
    img_s = np.asarray(P._render_block(scene, options, seed, 0, spp)) / spp
    return img_k, img_s


@pytest.mark.parametrize('scene_file,spp,tol', [
    ('cbox/cbox.xml', 4, 0.01),
    ('veach_mi/mi.xml', 8, 0.01),
])
def test_fused_kernel_matches_scalar_engine(scene_file, spp, tol):
    img_k, img_s = _render_both(os.path.join(REF, scene_file), 128, 64,
                                spp)
    assert np.isfinite(img_k).all()
    assert np.isfinite(img_s).all()
    mk, ms = img_k.mean(), img_s.mean()
    assert abs(mk - ms) / ms < tol, (mk, ms)
    # same RNG stream + same advance semantics: most pixels agree almost
    # exactly (paths diverge only where Woop vs Moller-Trumbore fp noise
    # flips a comparison)
    rel = np.abs(img_k - img_s) / (img_s + 1e-3)
    assert np.median(rel) < 1e-4


@pytest.mark.skipif(
    __import__('jax').default_backend() != 'tpu',
    reason="compiled-Mosaic pin (TPU-only)")
def test_fused_kernel_compiled_pin():
    """Compiled-kernel numeric pin: the SAME fused megakernel render,
    Mosaic-compiled vs Pallas interpreter mode, on a downscaled cbox.
    The interpreter lowers through plain XLA, so a disagreement here
    localizes a Mosaic compilation regression in minutes instead of a
    21-minute suite run (the golden gates catch it too, but only
    statistically and much later)."""
    import dataclasses
    import lajolla_tpu.integrators.path_megakernel as MK
    from lajolla_tpu.scene.parser import parse_scene

    scene, options = parse_scene(os.path.join(REF, 'cbox/cbox.xml'))
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=128, height=64))
    spp = 4
    img_c = np.asarray(MK.render_fused(scene, options, 0, 0, spp)) / spp
    old = MK.INTERPRET
    MK.INTERPRET = True
    try:
        img_i = np.asarray(MK.render_fused(scene, options, 0, 0,
                                           spp)) / spp
    finally:
        MK.INTERPRET = old
    assert np.isfinite(img_c).all()
    rel = np.abs(img_c - img_i) / (img_i + 1e-3)
    # identical algorithm + RNG stream; only fp scheduling differs
    assert np.median(rel) < 1e-4, float(np.median(rel))
    assert abs(img_c.mean() - img_i.mean()) / img_i.mean() < 5e-3


def test_fused_kernel_no_quads_branch(monkeypatch):
    """has_quads=False static specialization (path_kernel._advance_core
    skips the quad-flag selects, the second one-hot attribute matmul and
    the barycentric remap when no parallelograms merged) must still
    match the scalar engine. Compiles cbox with merging disabled so the
    fused kernel takes the no-quad branch."""
    import dataclasses
    import lajolla_tpu.scene.compile as C
    import lajolla_tpu.integrators.path_megakernel as MK
    import lajolla_tpu.integrators.path as P
    from lajolla_tpu.scene.parser import parse_scene

    monkeypatch.setattr(
        C, '_merge_parallelograms',
        lambda vertices, indices, num_tris: (
            np.arange(max(num_tris, 1), dtype=np.int32),
            np.zeros(max(num_tris, 1), bool)))
    scene, options = parse_scene(os.path.join(REF, 'cbox/cbox.xml'))
    assert scene.meta.has_quads is False
    assert scene.cast_src.shape[0] == 38      # nothing merged
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=128, height=64))
    spp = 4
    old = MK.INTERPRET
    MK.INTERPRET = True
    try:
        img_k = np.asarray(MK.render_fused(scene, options, 0, 0,
                                           spp)) / spp
    finally:
        MK.INTERPRET = old
    img_s = np.asarray(P._render_block(scene, options, 0, 0, spp)) / spp
    assert np.isfinite(img_k).all()
    rel = np.abs(img_k - img_s) / (img_s + 1e-3)
    assert np.median(rel) < 1e-4
    assert abs(img_k.mean() - img_s.mean()) / img_s.mean() < 0.01


def test_render_block_kernel_dispatch(monkeypatch):
    """Regression for the round-3 advisor HIGH finding: _render_block's
    fast-path dispatch (TPU-only in production, so CPU suites never
    exercised it) must hand back the (h, w, 3) film the kernels return
    directly — round 3 briefly unpacked it as a (film, state) tuple,
    which raised ValueError on every fused-scene TPU render. Here the
    dispatch plumbing runs on CPU with the kernels stubbed out."""
    import jax.numpy as jnp
    import lajolla_tpu.integrators.path as P
    import lajolla_tpu.integrators.path_megakernel as MK
    from lajolla_tpu.scene.parser import parse_scene
    import dataclasses

    scene, options = parse_scene(os.path.join(REF, 'cbox/cbox.xml'))
    w, h = 128, 64                      # n = 8192 = 2 * MK.BLOCK -> fused
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=w, height=h))
    n = w * h
    assert n % MK.BLOCK == 0 and n > MK.BLOCK

    calls = []
    monkeypatch.setattr(P, '_use_kernel', lambda s: True)
    monkeypatch.setattr(
        MK, 'render_fused',
        lambda s, o, seed, s0, nspp: calls.append('fused') or
        jnp.zeros((h, w, 3)))
    monkeypatch.setattr(
        P, '_render_block_kernel',
        lambda s, o, seed, s0, nspp, lanes, nn, end:
        calls.append('kernel') or jnp.zeros((h, w, 3)))

    img = P._render_block(scene, options, 0, 0, 4)          # fused branch
    assert img.shape == (h, w, 3) and calls == ['fused']
    img = P._render_block(scene, options, 0, 0, 4, lanes=n // 2)
    assert img.shape == (h, w, 3) and calls == ['fused', 'kernel']


def test_closest_divfree_matches_dividing_form():
    """CLOSEST_DIVFREE (cross-multiplied tournament min, one divide per
    lane) against the dividing closest cast on cbox interior rays: same
    hit set, t to ~1e-7 relative, winners identical except rational
    near-ties (<1%)."""
    import jax.numpy as jnp
    import lajolla_tpu.integrators.path_kernel as PK
    from lajolla_tpu.scene.parser import parse_scene

    scene, _ = parse_scene(os.path.join(REF, 'cbox/cbox.xml'))
    W = PK._woop_mat(scene.fp_woop)
    TC = scene.fp_woop.shape[0]
    qf = jnp.asarray(scene.cast_quad[:, None])
    rng = np.random.default_rng(1)
    o = jnp.asarray(np.float32(
        rng.uniform([0, 0, 0], [550, 550, 550], (2048, 3))).T)
    d = np.float32(rng.normal(size=(2048, 3)))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.T)
    a = PK._intersect(o, d, 1e-3, None, W, TC, qf)
    b = PK._intersect_divfree(o, d, 1e-3, W, TC, qf)
    ta, tb = np.asarray(a[0]), np.asarray(b[0])
    assert (np.isfinite(ta) == np.isfinite(tb)).all()
    m = np.isfinite(ta)
    assert np.allclose(ta[m], tb[m], rtol=1e-5)
    same = (np.asarray(a[1]) == np.asarray(b[1])).all(axis=0)
    assert same.mean() > 0.99
    for i in (2, 3):
        xa, xb = np.asarray(a[i])[0], np.asarray(b[i])[0]
        assert np.abs(xa - xb)[same & m[0]].max() < 1e-5
