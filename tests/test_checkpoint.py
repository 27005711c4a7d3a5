"""Checkpoint/resume: a render interrupted mid-way and resumed must be
bit-identical to an uninterrupted one (counter-based RNG guarantees it)."""

import numpy as np

from lajolla_tpu.integrators.path import render_path
from lajolla_tpu.scene.types import RenderOptions
from lajolla_tpu.testing import make_furnace_scene


def test_checkpoint_resume_exact(tmp_path):
    scene = make_furnace_scene(albedo=0.5, res=8)
    opts = RenderOptions(integrator='path', samples_per_pixel=48,
                         max_depth=3)
    ref = np.asarray(render_path(scene, opts, seed=7))

    ckpt = str(tmp_path / "film.npz")
    # phase 1: render only the first 16 samples, "crash"
    opts1 = RenderOptions(integrator='path', samples_per_pixel=16,
                          max_depth=3)
    render_path(scene, opts1, seed=7, checkpoint=ckpt)
    # phase 2: resume to the full 48
    out = np.asarray(render_path(scene, opts, seed=7, checkpoint=ckpt))
    np.testing.assert_array_equal(out, ref)
