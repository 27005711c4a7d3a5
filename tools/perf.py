"""TPU perf harness: one measurement point per process, recorded in the
committed ledger (docs/PERF_LEDGER.jsonl).

Promoted from the round-4 scratch harness (/root/work/perf1.py) per
VERDICT r4 #5, with its failure modes fixed:
  - sys.path bootstrap (the scratch version lost 13 queued measurements
    to ModuleNotFoundError when launched without PYTHONPATH),
  - an exclusive device lock shared with bench.py so a perf run can
    never again contaminate the round-end bench (VERDICT r4 weak #1),
  - adaptive repeats: keep timing until the spread is below the effect
    size we need to resolve (~6%) or the repeat cap, recording ALL
    repeats (VERDICT r4 weak #8),
  - every outcome (including failures, with a traceback tail) is
    appended to the ledger with the git revision.

usage: python tools/perf.py SCENE [SPP] [knob=value ...]
  SCENE in {cbox, veach, matpreview, sponza, vol_cbox, hetvol, disney}
  knobs:  pk.OCC_DIVFREE=0 pk.CLOSEST_DIVFREE=1 sw.CPI=4 vp.K_FF=16
          vp.GRID_LANES=32768 cp.MERGE_QUADS=0 ga.ONEHOT_LIMIT=0
          lanes=16384 (drained-engine lane pool override)
  module prefixes: pk=path_kernel mk=path_megakernel p=path vp=volpath
          vk=volpath_kernel sw=intersect_sweep ga=gather cp=compile
          ip=intersect_pallas
A fresh process per config sidesteps jit-cache staleness for
module-global knobs and isolates axon worker crashes.
"""
import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

LOCK_PATH = "/tmp/lajolla_tpu_device.lock"
LEDGER = os.path.join(REPO, "docs", "PERF_LEDGER.jsonl")

REF = "/root/reference/scenes"
SCENES = {
    "cbox": (f"{REF}/cbox/cbox.xml", 256),
    "veach": (f"{REF}/veach_mi/mi.xml", 128),
    "matpreview": (f"{REF}/matpreview/matpreview.xml", 2),
    "sponza": (f"{REF}/sponza/sponza.xml", 1),
    "vol_cbox": (f"{REF}/volpath_test/vol_cbox.xml", 64),
    "hetvol": (f"{REF}/volpath_test/hetvol.xml", 1),
    "disney": (f"{REF}/disney_bsdf_test/disney_bsdf.xml", 16),
}

MODS = {"pk": "lajolla_tpu.integrators.path_kernel",
        "mk": "lajolla_tpu.integrators.path_megakernel",
        "p": "lajolla_tpu.integrators.path",
        "vp": "lajolla_tpu.integrators.volpath",
        "vk": "lajolla_tpu.integrators.volpath_kernel",
        "gk": "lajolla_tpu.integrators.volpath_grid_kernel",
        "sw": "lajolla_tpu.ops.intersect_sweep",
        "ga": "lajolla_tpu.ops.gather",
        "ip": "lajolla_tpu.ops.intersect_pallas",
        "cp": "lajolla_tpu.scene.compile"}

# stop repeating once (max-min)/min of the best cluster is under this
SPREAD_TARGET = 0.06
MAX_REPEATS = 6


def acquire_device_lock(note="perf"):
    """Blocking exclusive lock shared by every process that touches the
    TPU for timing (tools/perf.py, bench.py). Returns the open fd, held
    for process lifetime."""
    import fcntl
    if os.environ.get("LAJOLLA_NO_LOCK"):   # CPU smoke runs don't
        return None                          # contend for the chip
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        print(f"[{note}] waiting for device lock {LOCK_PATH} ...",
              file=sys.stderr, flush=True)
        fcntl.flock(fd, fcntl.LOCK_EX)
    os.ftruncate(fd, 0)
    os.write(fd, f"{note} pid={os.getpid()}\n".encode())
    return fd


def _git_rev():
    try:
        return subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        return "unknown"


def ledger_append(row):
    row = dict(row)
    try:
        import jax
        row.setdefault("backend", jax.default_backend())
    except Exception:
        pass
    row.setdefault("rev", _git_rev())
    row.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S"))
    os.makedirs(os.path.dirname(LEDGER), exist_ok=True)
    with open(LEDGER, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    import importlib
    name = sys.argv[1]
    path, default_spp = SCENES[name]
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else default_spp
    knob_args = sys.argv[3:]

    lock_note = f"perf {name} {spp} {' '.join(knob_args)}"
    row = {"scene": name, "spp": spp, "argv": sys.argv[1:]}
    try:
        fd = acquire_device_lock(lock_note)  # noqa: F841 (held for life)
        import jax
        # LAJOLLA_CACHE_DIR="" disables the persistent compile cache —
        # used to re-roll a compile when a cached executable is
        # suspected of being a bad (slow) Mosaic/XLA compile
        cache = os.environ.get("LAJOLLA_CACHE_DIR", "/root/work/jaxcache")
        if cache:
            jax.config.update('jax_compilation_cache_dir', cache)
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              5.0)

        if not cache:
            row["nocache"] = True
        knobs, lanes = {}, None
        for kv in knob_args:
            k, v = kv.split("=")
            if k == "lanes":
                lanes = int(v)
                knobs["lanes"] = lanes
                continue
            pre, attr = k.split(".")
            mod = importlib.import_module(MODS[pre])
            old = getattr(mod, attr)
            setattr(mod, attr, bool(int(v)) if isinstance(old, bool)
                    else type(old)(int(v)))
            knobs[k] = v
        row["knobs"] = knobs

        import numpy as np
        from lajolla_tpu.scene.parser import parse_scene
        scene, options = parse_scene(path)
        options = dataclasses.replace(options, samples_per_pixel=spp)
        w, h = scene.meta.width, scene.meta.height

        if lanes is not None:
            from lajolla_tpu.integrators.path import _render_block_drained
            n = w * h

            def render_once(seed):
                return _render_block_drained(scene, options, seed, 0, spp,
                                             lanes)[:n]
        else:
            from lajolla_tpu.render import render

            def render_once(seed):
                return render(scene, options, seed=seed)

        t0 = time.time()
        np.asarray(render_once(0))
        compile_s = time.time() - t0
        np.asarray(render_once(99))   # ramp: first executions of a
        # freshly-loaded program run ~3.7x slow (docs/PERF_LEDGER.md)
        ts = []
        for r in range(MAX_REPEATS):
            t0 = time.time()
            np.asarray(render_once(1 + r))
            ts.append(time.time() - t0)
            if len(ts) >= (2 if ts[0] > 20 else 3):
                best = sorted(ts)[:3]
                if (best[-1] - best[0]) / max(best[0], 1e-9) < SPREAD_TARGET:
                    break
        mpaths = w * h * spp / min(ts) / 1e6
        row.update({"mpaths": round(mpaths, 4),
                    "times": [round(t, 3) for t in ts],
                    "compile_s": round(compile_s, 1)})
        ledger_append(row)
        print(json.dumps(row))
        return 0
    except Exception as e:                                # noqa: BLE001
        import traceback
        tb = traceback.format_exc().strip().splitlines()
        row.update({"failed": True,
                    "error": f"{type(e).__name__}: {e}"[:300],
                    "tb_tail": tb[-3:]})
        ledger_append(row)
        print(json.dumps(row))
        return 1


if __name__ == "__main__":
    sys.exit(main())
