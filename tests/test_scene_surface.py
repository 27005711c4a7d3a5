"""Full scene-surface smoke sweep (CPU-only).

The golden gates (test_golden.py) cover the six benchmark scenes plus
disney_bsdf; this sweep renders the rest of the reference scene corpus
at 32x32 so a parser / compiler / estimator regression on any shipped
scene class fails the suite instead of only failing a user. Each pin is
the deterministic CPU film mean at seed 0 (counter-based RNG — exact
reproducibility; the wide rel tolerance only absorbs XLA scheduling
drift, not estimator changes, which move these means by >> 5%).

Scene classes covered here and nowhere else end-to-end:
  - pixel_filter_test: tent + gaussian reconstruction filters in a real
    render (filter warps are unit-tested in test_filters.py only)
  - simple_sphere: sphere-geometry-only scene through the fast path
  - volpath_test1: vol_path_version 1 single-chunk end-to-end
  - volpath_test6: the final volpath engine on the version-6 scene
  - hetvol_colored: per-channel (colored) grid majorants
  - vol_cbox_teapot: mesh-bounded interior medium via the binned caster

CPU-only: 6 fresh scene shapes = 6 extra TPU compiles (~minutes each
remotely) for coverage that is platform-independent estimator plumbing.
"""
import dataclasses
import os

import numpy as np
import pytest

REF = '/root/reference/scenes'

jax = pytest.importorskip('jax')
pytestmark = pytest.mark.skipif(
    jax.default_backend() == 'tpu',
    reason='CPU-only surface sweep (6 scene compiles; platform-'
           'independent coverage)')

# rel path -> pinned 32x32 @4spp seed-0 film mean (captured on the
# 8-device CPU fixture; /root/work/scene_sweep.py)
PINS = [
    ('pixel_filter_test/pixel_filter_test', 0.43358),
    ('disney_bsdf_test/simple_sphere', 0.13133),
    ('volpath_test/volpath_test1', 0.02000),
    ('volpath_test/volpath_test6', 2.69759),
    ('volpath_test/hetvol_colored', 0.05245),
    ('volpath_test/vol_cbox_teapot', 0.18126),
]


@pytest.mark.parametrize('rel,mean_pin', PINS,
                         ids=[p[0].split('/')[-1] for p in PINS])
def test_scene_renders_and_pins(rel, mean_pin):
    from lajolla_tpu.scene.parser import parse_scene_to_builder
    from lajolla_tpu.scene.compile import compile_scene
    from lajolla_tpu.render import render

    b = parse_scene_to_builder(f'{REF}/{rel}.xml')
    b.camera.width = 32
    b.camera.height = 32
    scene = compile_scene(b)
    opts = dataclasses.replace(b.options, samples_per_pixel=4)
    img = np.asarray(render(scene, opts, seed=0))
    assert np.isfinite(img).all()
    assert img.mean() == pytest.approx(mean_pin, rel=0.05), \
        float(img.mean())
