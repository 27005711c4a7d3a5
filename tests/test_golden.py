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


# ---------------------------------------------------------------------------
# Image gates: per-pixel rel-RMSE against committed golden thumbnails
# (tools/make_goldens.py). These catch localized estimator breakage —
# e.g. a sign-flipped MIS weight in a dim region — that film-mean pins
# miss. Thresholds are calibrated per scene ~2x above the Monte-Carlo
# noise of the test-spp render (stored in the npz).
# ---------------------------------------------------------------------------

import os

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLD_SCENES = {
    "cbox": f"{REF}/cbox/cbox.xml",
    "veach_mi": f"{REF}/veach_mi/mi.xml",
    "vol_cbox": f"{REF}/volpath_test/vol_cbox.xml",
    "hetvol": f"{REF}/volpath_test/hetvol.xml",
    "matpreview": f"{REF}/matpreview/matpreview.xml",
    "disney_bsdf": f"{REF}/disney_bsdf_test/disney_bsdf.xml",
}


def _down4(img):
    h, w, c = img.shape
    return img[:h - h % 4, :w - w % 4].reshape(
        h // 4, 4, w // 4, 4, c).mean(axis=(1, 3))


def rel_rmse(a, b):
    """4x4-downsampled relative RMSE (tools/make_goldens.py metric)."""
    a, b = _down4(a), _down4(b)
    eps = 0.1 * float(b.mean()) + 1e-6
    return float(np.sqrt(np.mean((a - b) ** 2 / (b ** 2 + eps ** 2))))


@pytest.mark.parametrize("name", sorted(GOLD_SCENES))
def test_golden_image_gate(name):
    path = os.path.join(GOLD_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no golden for {name} (run tools/make_goldens.py)")
    g = np.load(path)
    scene, opts = load_lowres(GOLD_SCENES[name], int(g["res"]))
    opts = dataclasses.replace(opts,
                               samples_per_pixel=int(g["test_spp"]))
    img = np.asarray(render(scene, opts, seed=2))
    assert np.isfinite(img).all()
    err = rel_rmse(img, g["img"])
    assert err <= float(g["thresh"]), \
        f"{name}: rel-RMSE {err:.4f} > {float(g['thresh']):.4f}"
