"""Image/loader tests (reference analogues: tests/image.cpp, tests/mipmap.cpp)."""

import numpy as np
import pytest

from lajolla_tpu.io.exr import read_exr, write_exr
from lajolla_tpu.io.pfm import read_pfm, write_pfm
from lajolla_tpu.io.obj import load_obj
from lajolla_tpu.scene.texture import make_mipmap

REF_SCENES = "/root/reference/scenes"


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((37, 53, 3)).astype(np.float32) * 8
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    img2, order = read_exr(p)
    assert order == ['R', 'G', 'B']
    # fp16 storage tolerance (reference uses 1e-2 on a [0,1] image)
    assert np.abs(img2 - img).max() < 8 * 1e-2


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(1).random((16, 24, 3)).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    write_pfm(p, img)
    assert np.array_equal(read_pfm(p), img)


def test_exr_piz_envmap():
    img, order = read_exr(f"{REF_SCENES}/matpreview/envmap.exr")
    assert img.shape == (256, 512, 3)
    assert np.isfinite(img).all()
    assert img.max() > 5  # HDR content
    assert img.min() >= 0


def test_obj_quad_split(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    m = load_obj(str(p))
    assert m['indices'].shape == (2, 3)
    # smooth normals generated
    assert np.allclose(np.abs(m['normals'][:, 2]), 1.0)


def test_mipmap_constant_invariance():
    img = np.full((64, 64, 3), 0.7, np.float32)
    pyr = make_mipmap(img)
    assert len(pyr) == 7  # ceil(log2(64)) + 1
    for level in pyr:
        assert np.allclose(level, 0.7, atol=1e-6)


def test_mipmap_level_cap():
    img = np.zeros((1024, 1024, 3), np.float32)
    assert len(make_mipmap(img)) == 8  # capped (mipmap.h:5)
