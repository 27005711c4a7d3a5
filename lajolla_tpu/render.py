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


def render(scene, options=None, seed=0, checkpoint=None, progress=False):
    """Render → (H, W, 3) float32 numpy image.

    checkpoint: optional path; the film accumulator + sample index are
    persisted after every block, and an interrupted render resumes
    exactly (counter-based RNG makes the remaining samples independent
    of when they are computed).
    """
    if options is None:
        options = RenderOptions()
    if options.integrator in _AUX:
        from lajolla_tpu.integrators.aux import render_aux
        fn = jax.jit(render_aux, static_argnames=('options',))
        img = fn(scene, options)
    elif options.integrator == 'path':
        from lajolla_tpu.integrators.path import render_path
        img = render_path(scene, options, seed, checkpoint=checkpoint,
                          progress=progress)
    elif options.integrator == 'volpath':
        from lajolla_tpu.integrators.volpath import render_volpath
        img = render_volpath(scene, options, seed, checkpoint=checkpoint,
                             progress=progress)
    else:
        raise ValueError(f"unknown integrator: {options.integrator}")
    return np.asarray(img)
