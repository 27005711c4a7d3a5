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


@pytest.mark.skipif(
    __import__('jax').default_backend() == 'tpu',
    reason="interpret-mode semantics duplicate the CPU suite; the "
           "compiled-Mosaic pin below covers TPU (and the interpret "
           "program takes minutes to compile through the TPU backend)")
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


_QUAD_OBJ = """v -1 {y} -1
v 1 {y} -1
v 1 {y} 1
v -1 {y} 1
f 1 2 3
f 1 3 4
"""

_SPHERE_SCENE = """<?xml version="1.0"?>
<scene version="0.5.0">
  <integrator type="volpath">
    <integer name="maxDepth" value="-1"/>
    <integer name="version" value="6"/>
  </integrator>
  <medium type="homogeneous" id="med">
    <rgb name="sigmaA" value="0.02 0.03 0.02"/>
    <rgb name="sigmaS" value="0.08 0.06 0.09"/>
  </medium>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookAt origin="0, 1, 4" target="0, 0.3, 0" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="64"/><integer name="height" value="64"/>
      <rfilter type="box"/>
    </film>
    <ref id="med"/>
  </sensor>
  <bsdf type="diffuse" id="white"><rgb name="reflectance" value="0.7 0.7 0.7"/></bsdf>
  <bsdf type="diffuse" id="red"><rgb name="reflectance" value="0.8 0.3 0.2"/></bsdf>
  <shape type="sphere">
    <float name="radius" value="0.6"/>
    <point name="center" x="0" y="0.3" z="0"/>
    <ref id="red"/>
    <ref name="exterior" id="med"/>
  </shape>
  <shape type="obj">
    <string name="filename" value="floor.obj"/>
    <ref id="white"/>
    <ref name="exterior" id="med"/>
  </shape>
  <shape type="obj">
    <string name="filename" value="light.obj"/>
    <ref id="white"/>
    <emitter type="area"><rgb name="radiance" value="6 6 6"/></emitter>
    <ref name="exterior" id="med"/>
  </shape>
</scene>
"""


@pytest.mark.skipif(
    __import__('jax').default_backend() == 'tpu',
    reason="interpret-mode semantics duplicate the CPU suite; the "
           "compiled-Mosaic pin below covers TPU (and the interpret "
           "program takes minutes to compile through the TPU backend)")
def test_vol_kernel_sphere_branch(tmp_path):
    """S > 0 compilation path: sphere geometry + sphere closest-hit /
    any-hit inside the fused vol kernel, uniform homogeneous medium.
    No corpus scene combines spheres with the uniform-medium class, so
    this synthetic scene (sphere on a floor under a quad area light,
    all submerged) pins it against the general engine per pixel."""
    import lajolla_tpu.integrators.volpath as VP
    import lajolla_tpu.integrators.volpath_kernel as VK
    from lajolla_tpu.scene.parser import parse_scene

    (tmp_path / 'floor.obj').write_text(_QUAD_OBJ.format(y=-0.3))
    # light quad faces DOWN (reversed winding)
    light = _QUAD_OBJ.format(y=2.0).replace('f 1 2 3', 'f 3 2 1').replace(
        'f 1 3 4', 'f 4 3 1')
    (tmp_path / 'light.obj').write_text(light)
    xml = tmp_path / 'scene.xml'
    xml.write_text(_SPHERE_SCENE)
    scene, options = parse_scene(str(xml))
    assert scene.meta.num_spheres == 1
    assert scene.meta.uniform_medium
    assert VK.supports(scene.meta)
    spp = 32
    old = VK.INTERPRET
    VK.INTERPRET = True
    try:
        img_k = np.asarray(VK.render_fused_vol(scene, options, 0, 0,
                                               spp)) / spp
    finally:
        VK.INTERPRET = old
    img_s = np.asarray(VP._render_volpath_block(
        scene, options, 0, 0, spp, None)[0]).reshape(64, 64, 3) / spp
    assert np.isfinite(img_k).all()
    assert img_s.mean() > 1e-3          # scene actually lit
    # sphere pixels diverge chaotically (kernel quadratic vs general
    # caster fp detail — same as the surface kernel on veach); non-
    # sphere pixels stay exact and the estimator agrees statistically:
    # measured d8 error 0.057 vs 0.227 seed-to-seed spread at 32 spp
    rel = np.abs(img_k - img_s) / (img_s + 1e-3)
    assert np.median(rel) < 1e-5
    a = img_k.reshape(8, 8, 8, 8, 3).mean((1, 3))
    b = img_s.reshape(8, 8, 8, 8, 3).mean((1, 3))
    d8 = np.sqrt(((a - b) ** 2).mean()) / b.mean()
    assert d8 < 0.12                    # ~2x measured, < half seed noise
    assert abs(img_k.mean() - img_s.mean()) / img_s.mean() < 0.01


@pytest.mark.skipif(
    __import__('jax').default_backend() == 'tpu',
    reason="interpret-mode semantics duplicate the CPU suite; the "
           "compiled-Mosaic pin below covers TPU (and the interpret "
           "program takes minutes to compile through the TPU backend)")
def test_vol_kernel_hg_phase(tmp_path):
    """HG phase in the fused kernel (exact inverse-CDF sampling, lobe
    eval in NEE and emissive MIS). The kernel computes the HG 1.5 power
    as t*sqrt(t) vs the engine's `** 1.5` (ulp-level), so assertions
    are statistical like the sphere branch."""
    import lajolla_tpu.integrators.volpath as VP
    import lajolla_tpu.integrators.volpath_kernel as VK
    from lajolla_tpu.scene.parser import parse_scene

    (tmp_path / 'floor.obj').write_text(_QUAD_OBJ.format(y=-0.3))
    light = _QUAD_OBJ.format(y=2.0).replace('f 1 2 3', 'f 3 2 1').replace(
        'f 1 3 4', 'f 4 3 1')
    (tmp_path / 'light.obj').write_text(light)
    xml = tmp_path / 'scene.xml'
    hg_scene = _SPHERE_SCENE.replace(
        '<rgb name="sigmaS" value="0.08 0.06 0.09"/>',
        '<rgb name="sigmaS" value="0.2 0.18 0.22"/>\n'
        '    <phase type="hg"><float name="g" value="0.4"/></phase>')
    xml.write_text(hg_scene)
    scene, options = parse_scene(str(xml))
    from lajolla_tpu.scene.types import PHASE_HG
    assert scene.meta.phase_types_present == (PHASE_HG,)
    assert VK.supports(scene.meta)
    spp = 32
    old = VK.INTERPRET
    VK.INTERPRET = True
    try:
        img_k = np.asarray(VK.render_fused_vol(scene, options, 0, 0,
                                               spp)) / spp
    finally:
        VK.INTERPRET = old
    img_s = np.asarray(VP._render_volpath_block(
        scene, options, 0, 0, spp, None)[0]).reshape(64, 64, 3) / spp
    assert np.isfinite(img_k).all()
    assert img_s.mean() > 1e-3
    rel = np.abs(img_k - img_s) / (img_s + 1e-3)
    assert np.median(rel) < 1e-4
    a = img_k.reshape(8, 8, 8, 8, 3).mean((1, 3))
    b = img_s.reshape(8, 8, 8, 8, 3).mean((1, 3))
    d8 = np.sqrt(((a - b) ** 2).mean()) / b.mean()
    assert d8 < 0.12
    assert abs(img_k.mean() - img_s.mean()) / img_s.mean() < 0.01


def test_vol_kernel_gate():
    """supports() only fires for the uniform-homogeneous class."""
    import lajolla_tpu.integrators.volpath_kernel as VK
    from lajolla_tpu.scene.parser import parse_scene
    s_het, _ = parse_scene(f'{REF}/volpath_test/hetvol.xml')
    assert not VK.supports(s_het.meta)          # grid medium
    s_cbox, _ = parse_scene(f'{REF}/cbox/cbox.xml')
    assert not VK.supports(s_cbox.meta)         # no medium at all


def test_vol_kernel_fallback(monkeypatch):
    """A Mosaic compile failure in the kernel must not kill an
    unattended render: render_volpath falls back to the general engine
    for the whole run (volpath.py kernel branch)."""
    import lajolla_tpu.integrators.volpath as VP
    import lajolla_tpu.integrators.volpath_kernel as VK
    from lajolla_tpu.scene.parser import parse_scene

    scene, options = parse_scene(f'{REF}/volpath_test/vol_cbox.xml')
    scene = dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=16, height=16))
    options = dataclasses.replace(options, samples_per_pixel=2)
    monkeypatch.setattr(VP, '_use_vol_kernel', lambda s: True)

    def boom(*a, **k):
        raise RuntimeError('mosaic says no')
    monkeypatch.setattr(VK, 'render_fused_vol', boom)
    img = np.asarray(VP.render_volpath(scene, options, seed=0))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0


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
