"""Round-3 profiling: where does a matpreview/sponza bounce go?

Times, on the real TPU, for a parsed scene:
  - argsort of N sort keys (done 4x per bounce today)
  - intersect_sweep / occluded_sweep (sorted and unsorted)
  - one full wavefront advance step (cast + shade glue)
  - the shade glue alone (advance step minus the casts, estimated)

Usage: python tools/profile_binned.py [scene] [lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lajolla_tpu.scene.compile import compile_scene
from lajolla_tpu.scene.parser import parse_scene_to_builder

REF = "/root/reference/scenes"
SCENES = {
    "matpreview": f"{REF}/matpreview/matpreview.xml",
    "sponza": f"{REF}/sponza/sponza.xml",
}


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "matpreview"
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    b = parse_scene_to_builder(SCENES[name])
    scene = compile_scene(b)
    opts = b.options
    m = scene.meta
    K = scene.sw_aabb.shape[0]
    C = scene.sw_A.shape[0] // K
    print(f"{name}: {m.num_triangles} tris, K={K} clusters x C={C}, "
          f"use_binned={m.use_binned}, film {m.width}x{m.height}, "
          f"lanes={lanes}")

    # representative rays: primary rays from the camera (coherent-ish),
    # and a hash-scrambled copy (incoherent, like bounce 3+)
    from lajolla_tpu.integrators.path import _primary_hash
    item = jnp.arange(lanes, dtype=jnp.int32)
    _, org, d = _primary_hash(scene, opts, item, jnp.uint32(7))
    perm = np.random.default_rng(0).permutation(lanes)
    org_i = org[perm] + 0.0
    rng = np.random.default_rng(1)
    d_i = jnp.asarray(rng.normal(size=(lanes, 3)), jnp.float32)
    d_i = d_i / jnp.linalg.norm(d_i, axis=1, keepdims=True)
    tn = jnp.zeros(lanes) + 1e-3
    tf = jnp.full(lanes, jnp.inf)

    from lajolla_tpu.ops import intersect_sweep as sw

    keys = jax.jit(sw._sort_keys)
    t = timeit(lambda o, dd: jnp.argsort(keys(scene, o, dd)), org, d)
    print(f"argsort(keys) {lanes}: {t * 1e3:.2f} ms "
          f"({lanes / t / 1e6:.1f} M/s)")

    cast_s = jax.jit(lambda o, dd: sw._sorted_call(
        scene, o, dd, tn, tf, False))
    cast_u = jax.jit(lambda o, dd: sw._call(scene, o, dd, tn, tf, False))
    occ_s = jax.jit(lambda o, dd: sw._sorted_call(
        scene, o, dd, tn, tf, True))
    for label, fn, o_, d_ in [
            ("cast sorted coherent", cast_s, org, d),
            ("cast unsorted coherent", cast_u, org, d),
            ("cast sorted incoherent", cast_s, org_i, d_i),
            ("cast unsorted incoherent", cast_u, org_i, d_i),
            ("occl sorted coherent", occ_s, org, d)]:
        t = timeit(fn, o_, d_)
        print(f"{label}: {t * 1e3:.2f} ms ({lanes / t / 1e6:.2f} Mrays/s)")

    # one full advance step
    from lajolla_tpu.integrators.path import _advance_lane, _pcg_hash, \
        _hash_u01, _GOLD
    su = jnp.uint32(7)
    kidx = (jnp.arange(8, dtype=jnp.uint32) * jnp.uint32(_GOLD) +
            jnp.uint32(_GOLD))[None, :]

    def step(org, d):
        z = jnp.zeros(lanes, jnp.float32)
        st = (item, jnp.full(lanes, 2, jnp.int32), org, d,
              jnp.full(lanes, 1e-3, jnp.float32), z,
              jnp.ones((lanes, 3), jnp.float32),
              jnp.zeros((lanes, 3), jnp.float32),
              jnp.ones(lanes, jnp.float32), z, org,
              jnp.zeros(lanes, jnp.bool_))
        hb = _pcg_hash(item.astype(jnp.uint32) ^ _pcg_hash(su))
        uN = _hash_u01(_pcg_hash(hb[:, None] + kidx))
        nst, died = jax.vmap(
            lambda u, *s: _advance_lane(scene, opts, s, u))(uN, *st)
        return nst[6], died

    t = timeit(jax.jit(step), org, d)
    print(f"full advance step: {t * 1e3:.2f} ms "
          f"({lanes / t / 1e6:.3f} Mpaths-steps/s)")


if __name__ == "__main__":
    main()
