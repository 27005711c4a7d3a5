"""Render driver: integrator dispatch + jit + film assembly.

The analogue of render() (src/render.cpp:155-167). Tile-based thread
parallelism becomes: one jitted SPMD program over the whole pixel grid
(megabatched samples), optionally sharded across chips by
lajolla_tpu.parallel.
"""

import jax
import numpy as np

from lajolla_tpu.scene.types import RenderOptions

_AUX = ('depth', 'shadingNormal', 'meanCurvature', 'rayDifferential',
        'mipmapLevel')


def render(scene, options=None, seed=0):
    """Render → (H, W, 3) float32 numpy image."""
    if options is None:
        options = RenderOptions()
    if options.integrator in _AUX:
        from lajolla_tpu.integrators.aux import render_aux
        fn = jax.jit(render_aux, static_argnames=('options',))
        img = fn(scene, options)
    elif options.integrator == 'path':
        from lajolla_tpu.integrators.path import render_path
        img = render_path(scene, options, seed)
    elif options.integrator == 'volpath':
        from lajolla_tpu.integrators.volpath import render_volpath
        img = render_volpath(scene, options, seed)
    else:
        raise ValueError(f"unknown integrator: {options.integrator}")
    return np.asarray(img)
