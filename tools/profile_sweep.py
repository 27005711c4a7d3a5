"""Sweep-caster micro-benchmark: time intersect_sweep / occluded_sweep
in isolation on TPU at a fixed ray population, for knob sweeps.

The r3 per-step anatomy (closest 27 ms + shadow 24 ms + glue 10 ms at
32k lanes on matpreview) bounds the render rate, and the r4 kernel
changes (CPI, FTB breaks, LIST_B 512, break-aware DMA) were never
timed on TPU (VERDICT r5 task 3). This tool times just the casters so
one knob change = one number, without the queue/shading glue.

usage: python tools/profile_sweep.py SCENE [rays] [knob=value ...]
  SCENE in {matpreview, sponza}; knobs like sw.CPI=4 sw.LIST_B=256
  (module prefixes as tools/perf.py). Ray population: primary rays
  from the camera plus a diffuse-bounce-like population (primary hits
  + hashed cosine directions) — closest and any-hit timed on both.
"""
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.perf import MODS, acquire_device_lock, ledger_append  # noqa: E402

STEPS = 20


def main():
    scene_name = sys.argv[1]
    rays = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    acquire_device_lock(f"profile_sweep {scene_name} {rays}")
    import jax
    cache = os.environ.get("LAJOLLA_CACHE_DIR", "/root/work/jaxcache")
    if cache:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    import numpy as np

    knobs = {}
    for kv in sys.argv[3:]:
        k, v = kv.split("=")
        pre, attr = k.split(".")
        mod = importlib.import_module(MODS[pre])
        old = getattr(mod, attr)
        setattr(mod, attr, bool(int(v)) if isinstance(old, bool)
                else type(old)(int(v)))
        knobs[k] = v

    from lajolla_tpu.scene.parser import parse_scene
    from lajolla_tpu.integrators.path import _primary_hash
    from lajolla_tpu.ops.intersect_sweep import (intersect_sweep,
                                                 occluded_sweep)
    path = {"matpreview": "/root/reference/scenes/matpreview/matpreview.xml",
            "sponza": "/root/reference/scenes/sponza/sponza.xml"}[scene_name]
    scene, options = parse_scene(path)
    out = {"scene": f"{scene_name}_sweep", "rays": rays, "knobs": knobs}

    item = jnp.arange(rays, dtype=jnp.int32)
    _, o0, d0 = jax.jit(lambda: _primary_hash(scene, options, item,
                                              jnp.uint32(0)))()
    tn = jnp.full((rays,), 1e-3, jnp.float32)
    inf = jnp.full((rays,), jnp.inf, jnp.float32)

    # bounce-like population: origins at primary hits, cosine-ish dirs
    t1, _, _, _ = jax.jit(lambda: intersect_sweep(scene, o0, d0, tn,
                                                  inf))()
    tt = jnp.where(jnp.isfinite(t1), t1, 1.0)
    o1 = o0 + 0.999 * tt[:, None] * d0
    rng = np.random.default_rng(1)
    d1 = jnp.asarray(rng.normal(size=(rays, 3)), jnp.float32)
    d1 = d1 / jnp.linalg.norm(d1, axis=1, keepdims=True)

    def timeit(name, fn):
        f = jax.jit(fn)
        np.asarray(f())
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(f())
            ts.append(time.time() - t0)
        ms = min(ts) * 1e3 / STEPS
        out[name] = {"ms_per_call": round(ms, 3),
                     "mrays_s": round(rays / (ms * 1e3), 2)}

    def loop(cast, o, d):
        def body(_, c):
            o_, acc = c
            r = cast(scene, o_, d, tn, inf)
            t = r[0] if isinstance(r, tuple) else r.astype(jnp.float32)
            t = jnp.where(jnp.isfinite(t), t, 0.0)
            return (o_ + jnp.minimum(t, 0.0)[:, None] * 1e-9,
                    acc + jnp.sum(t))
        return lambda: jax.lax.fori_loop(0, STEPS, body,
                                         (o, jnp.float32(0.0)))[1]

    timeit("closest_primary", loop(intersect_sweep, o0, d0))
    timeit("closest_bounce", loop(intersect_sweep, o1, d1))
    timeit("anyhit_bounce", loop(occluded_sweep, o1, d1))
    ledger_append(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
