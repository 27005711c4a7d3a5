"""Multi-chip rendering: sample-axis data parallelism over a device mesh.

The reference's entire distribution story is a work-stealing thread pool
over 16x16 film tiles (src/parallel.cpp, render.cpp:75-99). The TPU-native
equivalent (SURVEY §2.7): ONE SPMD program — `shard_map` over a
`jax.sharding.Mesh`, sharding the *sample* axis (each chip renders the
full image with a disjoint slice of the per-pixel sample indices,
decorrelated by RNG key folding), scene arrays replicated (read-only),
film reduced with a single `psum` over ICI. Multi-host = the same program
over a bigger mesh; no new code path.

Pixel-axis sharding would equally work; sample-axis keeps every chip's
control flow identical (no tile shape remainders) and needs zero scene
re-layout.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lajolla_tpu.scene.types import RenderOptions


def default_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), ('samples',))


@partial(jax.jit, static_argnames=('options', 'mesh', 'spp_per_chip'))
def _render_sharded_jit(scene, options, seed, mesh, spp_per_chip):
    from lajolla_tpu.integrators.path import _render_block

    def per_chip(scene):
        chip = jax.lax.axis_index('samples')
        s0 = chip.astype(jnp.int32) * spp_per_chip
        img = _render_block(scene, options, seed, s0, spp_per_chip)
        return jax.lax.psum(img, 'samples')

    fn = jax.shard_map(per_chip, mesh=mesh,
                       in_specs=(P(),), out_specs=P(),
                       check_vma=False)
    return fn(scene)


def render_path_sharded(scene, options, seed=0, mesh=None):
    """Distributed path render. spp is split evenly across the mesh
    (rounded up)."""
    mesh = mesh or default_mesh()
    n = mesh.devices.size
    spp_per_chip = -(-options.samples_per_pixel // n)
    total = spp_per_chip * n
    img = _render_sharded_jit(scene, options, seed, mesh, spp_per_chip)
    return img / total


@partial(jax.jit, static_argnames=('options', 'mesh', 'spp_per_chip'))
def _render_volpath_sharded_jit(scene, options, seed, mesh, spp_per_chip):
    from lajolla_tpu.integrators.volpath import _render_volpath_block

    def per_chip(scene):
        chip = jax.lax.axis_index('samples')
        s0 = chip.astype(jnp.int32) * spp_per_chip
        film, _, _ = _render_volpath_block(scene, options, seed, s0,
                                           spp_per_chip)
        return jax.lax.psum(film, 'samples')

    fn = jax.shard_map(per_chip, mesh=mesh,
                       in_specs=(P(),), out_specs=P(),
                       check_vma=False)
    return fn(scene)


def render_volpath_sharded(scene, options, seed=0, mesh=None):
    """Distributed volumetric path render — identical sample-axis DP
    (the volpath engines are lane-pool loops over (pixel, sample) items,
    so sharding the sample index range needs no new machinery)."""
    mesh = mesh or default_mesh()
    n = mesh.devices.size
    spp_per_chip = -(-options.samples_per_pixel // n)
    total = spp_per_chip * n
    film = _render_volpath_sharded_jit(scene, options, seed, mesh,
                                       spp_per_chip)
    h, w = scene.meta.height, scene.meta.width
    return (film / total).reshape(h, w, 3)


def render_sharded(scene, options, seed=0, mesh=None):
    """Integrator-dispatching distributed render (main.cpp surface over
    a mesh)."""
    if options.integrator == 'volpath' and options.vol_path_version \
            not in (1, 2):
        return render_volpath_sharded(scene, options, seed, mesh)
    if options.integrator != 'path':
        raise NotImplementedError(
            f"render_sharded: integrator {options.integrator!r} "
            f"(vol_path_version={options.vol_path_version}) has no "
            "distributed driver; use render() single-chip")
    return render_path_sharded(scene, options, seed, mesh)
