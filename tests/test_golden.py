"""Golden-statistics regression tests on real reference scenes at low
resolution (re-compiling the parsed scene with a smaller film). These pin
whole-pipeline behavior — parser, compiler, intersection, materials,
lights, integrator — against known-good brightness statistics."""

import dataclasses

import numpy as np
import pytest

from lajolla_tpu.render import render
from lajolla_tpu.scene.compile import compile_scene
from lajolla_tpu.scene.parser import parse_scene_to_builder

REF = "/root/reference/scenes"


def load_lowres(path, res=64):
    b = parse_scene_to_builder(path)
    b.camera.width = res
    b.camera.height = res
    return compile_scene(b), b.options


def test_cbox_brightness():
    scene, opts = load_lowres(f"{REF}/cbox/cbox.xml", 64)
    opts = dataclasses.replace(opts, samples_per_pixel=16)
    img = render(scene, opts)
    assert np.isfinite(img).all()
    # pinned from validated 512x512 renders (mean 0.1373); low-res framing
    # shifts it slightly
    assert img.mean() == pytest.approx(0.137, rel=0.12)
    # red wall on the left, green wall on the right
    left = img[24:40, 2:8]
    right = img[24:40, -8:-2]
    assert left[..., 0].mean() > 1.5 * left[..., 1].mean()
    assert right[..., 1].mean() > 1.5 * right[..., 0].mean()


def test_veach_brightness():
    scene, opts = load_lowres(f"{REF}/veach_mi/mi.xml", 64)
    opts = dataclasses.replace(opts, samples_per_pixel=16)
    img = render(scene, opts)
    assert np.isfinite(img).all()
    # full-res mean is ~0.329; the 64x64 rebuild reframes to ~0.30
    # (measured 0.295-0.31 at 128spp across engines/RNG streams)
    assert img.mean() == pytest.approx(0.30, rel=0.15)


def test_volpath_cbox_brightness():
    scene, opts = load_lowres(f"{REF}/volpath_test/vol_cbox.xml", 48)
    opts = dataclasses.replace(opts, samples_per_pixel=8)
    img = render(scene, opts)
    assert np.isfinite(img).all()
    assert img.mean() == pytest.approx(0.34, rel=0.2)
