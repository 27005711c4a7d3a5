"""Fused volumetric megakernel vs the general homogeneous engine.

The vol kernel (integrators/volpath_kernel.py) replicates the final
volumetric integrator's advance (integrators/volpath.py
_advance_vol_lane → vol_path_tracing.h:503-869) with the class facts of
uniform-homogeneous-medium scenes folded in statically. Unlike the
surface megakernel (whose Woop casts diverge from the general engine's
Möller-Trumbore in fp detail), BOTH volumetric paths intersect via the
same cast tables, so the two engines agree to fp-fusion noise —
asserted per pixel, not just statistically.
"""

import dataclasses

import numpy as np
import pytest

REF = '/root/reference/scenes'


def _render_both(w, h, spp, seed=0, max_depth=-1):
    import lajolla_tpu.integrators.volpath as VP
    import lajolla_tpu.integrators.volpath_kernel as VK
    from lajolla_tpu.scene.parser import parse_scene

    scene, options = parse_scene(f'{REF}/volpath_test/vol_cbox.xml')
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=w, height=h))
    options = dataclasses.replace(options, max_depth=max_depth)
    assert VK.supports(scene.meta)
    old = VK.INTERPRET
    VK.INTERPRET = True
    try:
        img_k = np.asarray(VK.render_fused_vol(scene, options, seed, 0,
                                               spp)) / spp
    finally:
        VK.INTERPRET = old
    img_s = np.asarray(VP._render_volpath_block(
        scene, options, seed, 0, spp, None)[0]).reshape(h, w, 3) / spp
    return img_k, img_s


@pytest.mark.parametrize('spp,seed,max_depth', [
    (4, 0, -1),    # unbounded (the shipped vol_cbox config)
    (2, 3, 3),     # finite depth: the depth_stop + NEE branches
])
def test_vol_kernel_matches_general_engine(spp, seed, max_depth):
    img_k, img_s = _render_both(128, 64, spp, seed, max_depth)
    assert np.isfinite(img_k).all()
    assert np.isfinite(img_s).all()
    # same RNG cells + same cast tables: per-pixel agreement up to XLA
    # fusion fp noise
    rel = np.abs(img_k - img_s) / (img_s + 1e-3)
    assert np.median(rel) < 1e-5
    assert rel.max() < 0.05, rel.max()
    assert abs(img_k.mean() - img_s.mean()) / img_s.mean() < 1e-4


def test_vol_kernel_gate():
    """supports() only fires for the uniform-homogeneous class."""
    import lajolla_tpu.integrators.volpath_kernel as VK
    from lajolla_tpu.scene.parser import parse_scene
    s_het, _ = parse_scene(f'{REF}/volpath_test/hetvol.xml')
    assert not VK.supports(s_het.meta)          # grid medium
    s_cbox, _ = parse_scene(f'{REF}/cbox/cbox.xml')
    assert not VK.supports(s_cbox.meta)         # no medium at all


@pytest.mark.skipif(
    __import__('jax').default_backend() != 'tpu',
    reason="compiled-Mosaic pin (TPU-only)")
def test_vol_kernel_compiled_pin():
    """Mosaic-compiled vs interpreter-mode render of the SAME kernel
    (localizes Mosaic regressions; see test_kernel_engine.py)."""
    import lajolla_tpu.integrators.volpath_kernel as VK
    from lajolla_tpu.scene.parser import parse_scene
    scene, options = parse_scene(f'{REF}/volpath_test/vol_cbox.xml')
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=128, height=64))
    spp = 4
    img_c = np.asarray(VK.render_fused_vol(scene, options, 0, 0,
                                           spp)) / spp
    old = VK.INTERPRET
    VK.INTERPRET = True
    try:
        img_i = np.asarray(VK.render_fused_vol(scene, options, 0, 0,
                                               spp)) / spp
    finally:
        VK.INTERPRET = old
    assert np.isfinite(img_c).all()
    rel = np.abs(img_c - img_i) / (img_i + 1e-3)
    assert np.median(rel) < 1e-4
    assert abs(img_c.mean() - img_i.mean()) / img_i.mean() < 0.01
