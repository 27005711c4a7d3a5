"""Fused grid-media megakernel vs the general event machine.

The kernel (integrators/volpath_grid_kernel.py) mirrors
volpath._advance_event statement by statement with identical
counter-hash RNG cells, so with the f32/HIGHEST density matmul the two
engines must agree essentially per-pixel (the matmul-gather sums the
same 8 trilinear corner terms in a different association order — ulp
class). The default bf16 grid perturbs the density field by ~2^-8
relative, which flips a small fraction of real/null decisions: median
pixel still exact, film mean within noise.
"""

import dataclasses
import os

import numpy as np
import pytest

REF = '/root/reference/scenes'


def _hetvol_small(w=64, h=32):
    from lajolla_tpu.scene.parser import parse_scene
    scene, options = parse_scene(f'{REF}/volpath_test/hetvol.xml')
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=w, height=h))
    return scene, options


def test_supports_classification():
    import lajolla_tpu.integrators.volpath_grid_kernel as GK
    from lajolla_tpu.scene.parser import parse_scene
    scene, _ = _hetvol_small()
    assert GK.supports(scene.meta)
    # vol_cbox (homogeneous) and the colored grid stay off the kernel
    s2, _ = parse_scene(f'{REF}/volpath_test/vol_cbox.xml')
    assert not GK.supports(s2.meta)
    s3, _ = parse_scene(f'{REF}/volpath_test/hetvol_colored.xml')
    assert not GK.supports(s3.meta)


def test_grid_kernel_matches_event_machine():
    import lajolla_tpu.integrators.volpath_grid_kernel as GK
    from lajolla_tpu.render import render
    scene, options = _hetvol_small()
    spp = 2
    old_i, old_b = GK.INTERPRET, GK.GRID_BF16
    GK.INTERPRET = True
    try:
        GK.GRID_BF16 = False
        img_f = np.asarray(GK.render_fused_grid(scene, options, 0, 0,
                                                spp)) / spp
        GK.GRID_BF16 = True
        img_b = np.asarray(GK.render_fused_grid(scene, options, 0, 0,
                                                spp)) / spp
    finally:
        GK.INTERPRET, GK.GRID_BF16 = old_i, old_b
    opts = dataclasses.replace(options, samples_per_pixel=spp)
    img_e = np.asarray(render(scene, opts, seed=0))
    assert np.isfinite(img_f).all() and np.isfinite(img_b).all()

    # f32 density: per-pixel agreement at the fp-noise level
    rel_f = np.abs(img_f - img_e) / (img_e + 1e-3)
    assert np.percentile(rel_f, 95) < 1e-4, np.percentile(rel_f, 95)
    assert abs(img_f.mean() - img_e.mean()) / img_e.mean() < 1e-3

    # bf16 density: median pixel exact, mean within the 2-spp noise
    rel_b = np.abs(img_b - img_e) / (img_e + 1e-3)
    assert np.median(rel_b) < 1e-4
    assert abs(img_b.mean() - img_e.mean()) / img_e.mean() < 0.05


def test_grid_kernel_padded_lane_pool():
    """n not a BLOCK multiple: padding lanes start done, film rows are
    dropped. Work-item strides use the padded n, so the RNG cells
    differ from the engine's — agreement is statistical only."""
    import lajolla_tpu.integrators.volpath_grid_kernel as GK
    from lajolla_tpu.render import render
    scene, options = _hetvol_small(48, 48)     # 2304 % 2048 != 0
    spp = 1
    old_i = GK.INTERPRET
    GK.INTERPRET = True
    try:
        img_k = np.asarray(GK.render_fused_grid(scene, options, 0, 0,
                                                spp)) / spp
    finally:
        GK.INTERPRET = old_i
    opts = dataclasses.replace(options, samples_per_pixel=spp)
    img_e = np.asarray(render(scene, opts, seed=0))
    assert img_k.shape == (48, 48, 3)
    assert np.isfinite(img_k).all()
    assert abs(img_k.mean() - img_e.mean()) / img_e.mean() < 0.10
