"""Drive the shim-built reference binary (tools/ref_baseline/lajolla_ref)
to produce ground-truth artifacts for the round-3 verification tasks:

  1. Reference-rendered golden images for every gate scene (+ sponza),
     at the gate resolution, high spp  -> tests/golden_ref/<name>.npz
  2. Deterministic aux-integrator renders (depth / shadingNormal /
     meanCurvature / rayDifferential / mipmapLevel)
                                        -> tests/golden_ref/aux_*.npz
  3. The north-star workload: cbox 512x512 @ 256 spp
                                        -> tests/golden_ref/cbox_full.npz
  4. Single-thread baseline timings for all benchmark configs
     (main.cpp:34-42 prints render wall-clock)
                                        -> tools/ref_baseline/baselines.json

Idempotent: every stage skips if its artifact already exists, so a
killed run resumes.  Run:  python tools/ref_renders.py [stage ...]
Stages: goldens aux northstar baselines (default: all, in that order).
"""

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from ref_baseline.patch_scene import patch_scene  # noqa: E402

import numpy as np  # noqa: E402

REF = "/root/reference/scenes"
BIN = os.path.join(HERE, "ref_baseline", "lajolla_ref")
WORK = os.path.join(HERE, "ref_baseline", "build", "renders")
GOLD = os.path.join(REPO, "tests", "golden_ref")

# (name, scene path, gate res, golden spp)
GOLDENS = [
    ("cbox", f"{REF}/cbox/cbox.xml", 64, 4096),
    ("veach_mi", f"{REF}/veach_mi/mi.xml", 64, 4096),
    ("vol_cbox", f"{REF}/volpath_test/vol_cbox.xml", 48, 2048),
    ("hetvol", f"{REF}/volpath_test/hetvol.xml", 32, 512),
    ("matpreview", f"{REF}/matpreview/matpreview.xml", 64, 1024),
    ("disney_bsdf", f"{REF}/disney_bsdf_test/disney_bsdf.xml", 64, 1024),
    ("sponza", f"{REF}/sponza/sponza.xml", 64, 1024),
    # round 4: the rest of the scene corpus (tests/test_scene_surface.py
    # gates the classes no other golden covers: non-box reconstruction
    # filters, sphere-only fast path, volpath v1 + final-engine variants,
    # colored grid majorants, mesh-bounded interior media)
    ("pixel_filter", f"{REF}/pixel_filter_test/pixel_filter_test.xml",
     32, 2048),
    ("simple_sphere", f"{REF}/disney_bsdf_test/simple_sphere.xml",
     32, 2048),
    ("volpath1", f"{REF}/volpath_test/volpath_test1.xml", 32, 2048),
    ("volpath6", f"{REF}/volpath_test/volpath_test6.xml", 32, 1024),
    ("hetvol_colored", f"{REF}/volpath_test/hetvol_colored.xml", 32, 512),
    ("vol_cbox_teapot", f"{REF}/volpath_test/vol_cbox_teapot.xml",
     32, 1024),
]

AUX = [
    ("cbox", f"{REF}/cbox/cbox.xml",
     ["depth", "shadingNormal", "meanCurvature", "rayDifferential",
      "mipmapLevel"]),
    ("matpreview", f"{REF}/matpreview/matpreview.xml",
     ["depth", "shadingNormal", "meanCurvature"]),
    ("sponza", f"{REF}/sponza/sponza.xml",
     ["depth", "shadingNormal", "rayDifferential", "mipmapLevel"]),
]

# (name, scene, width, height, spp) — timing configs; rate extrapolates
# linearly in spp (disjoint pixels, same per-path work).
BASELINES = [
    ("cbox", f"{REF}/cbox/cbox.xml", 512, 512, 32),
    ("veach_mi", f"{REF}/veach_mi/mi.xml", 768, 512, 32),
    ("matpreview", f"{REF}/matpreview/matpreview.xml", 683, 512, 8),
    ("sponza", f"{REF}/sponza/sponza.xml", 768, 575, 4),
    ("vol_cbox", f"{REF}/volpath_test/vol_cbox.xml", 512, 512, 4),
    ("hetvol", f"{REF}/volpath_test/hetvol.xml", 768, 576, 2),
    # BASELINE.json config #3 is "disney_bsdf_test + matpreview"; the
    # Disney half was golden-gated but never TIMED (VERDICT r4
    # missing #2) — the combined-array scene at its native res
    ("disney_bsdf", f"{REF}/disney_bsdf_test/disney_bsdf.xml",
     683, 512, 8),
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_ref(xml, out_pfm, timeout=None):
    """Render a patched scene, return (image, render_seconds)."""
    t0 = time.time()
    p = subprocess.run([BIN, "-o", out_pfm, xml], capture_output=True,
                       text=True, timeout=timeout)
    if p.returncode != 0:
        raise RuntimeError(f"lajolla_ref failed on {xml}:\n{p.stderr[-2000:]}")
    # main.cpp prints "Took X seconds" after parse and after render;
    # the render one is last.
    secs = [float(m) for m in re.findall(r"Took ([0-9.eE+-]+) seconds",
                                         p.stdout)]
    render_s = secs[-1] if secs else time.time() - t0
    from lajolla_tpu.io.pfm import read_pfm
    return np.asarray(read_pfm(out_pfm), np.float32), render_s


def stage_goldens():
    os.makedirs(GOLD, exist_ok=True)
    for name, scene, res, spp in GOLDENS:
        out = os.path.join(GOLD, f"{name}.npz")
        if os.path.exists(out):
            log(f"goldens/{name}: exists, skip")
            continue
        log(f"goldens/{name}: {res}x{res} @{spp}spp ...")
        xml = patch_scene(scene, os.path.join(WORK, f"g_{name}.xml"),
                          spp=spp, width=res, height=res)
        img, s = run_ref(xml, os.path.join(WORK, f"g_{name}.pfm"))
        np.savez_compressed(out, img=img, res=res, spp=spp,
                            render_seconds=s)
        log(f"goldens/{name}: mean={img.mean():.4f} took {s:.1f}s")


def stage_aux():
    os.makedirs(GOLD, exist_ok=True)
    for name, scene, integs in AUX:
        for integ in integs:
            out = os.path.join(GOLD, f"aux_{name}_{integ}.npz")
            if os.path.exists(out):
                log(f"aux/{name}/{integ}: exists, skip")
                continue
            log(f"aux/{name}/{integ}: 64x64 ...")
            xml = patch_scene(
                scene, os.path.join(WORK, f"a_{name}_{integ}.xml"),
                spp=1, width=64, height=64, integrator=integ)
            img, s = run_ref(xml, os.path.join(WORK,
                                               f"a_{name}_{integ}.pfm"))
            np.savez_compressed(out, img=img, res=64)
            log(f"aux/{name}/{integ}: mean={img.mean():.4f} ({s:.1f}s)")


def stage_northstar():
    os.makedirs(GOLD, exist_ok=True)
    out = os.path.join(GOLD, "cbox_full.npz")
    if os.path.exists(out):
        log("northstar: exists, skip")
        return
    log("northstar: cbox 512x512 @256spp (single thread) ...")
    xml = patch_scene(f"{REF}/cbox/cbox.xml",
                      os.path.join(WORK, "ns_cbox.xml"), spp=256,
                      width=512, height=512)
    img, s = run_ref(xml, os.path.join(WORK, "ns_cbox.pfm"))
    np.savez_compressed(out, img=img, res=512, spp=256, render_seconds=s)
    log(f"northstar: mean={img.mean():.4f} took {s:.1f}s "
        f"({512 * 512 * 256 / s / 1e6:.3f} Mpaths/s 1-core)")


def stage_baselines():
    out_path = os.path.join(HERE, "ref_baseline", "baselines.json")
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    for name, scene, w, h, spp in BASELINES:
        if name in data:
            log(f"baselines/{name}: exists, skip")
            continue
        log(f"baselines/{name}: {w}x{h} @{spp}spp -t 1 ...")
        xml = patch_scene(scene, os.path.join(WORK, f"b_{name}.xml"),
                          spp=spp, width=w, height=h)
        img, s = run_ref(xml, os.path.join(WORK, f"b_{name}.pfm"))
        rate = w * h * spp / s / 1e6
        data[name] = {"width": w, "height": h, "spp": spp,
                      "render_seconds": s, "mpaths_per_sec_1core": rate,
                      "mean": float(img.mean())}
        with open(out_path, "w") as f:
            json.dump(data, f, indent=2)
        log(f"baselines/{name}: {s:.1f}s = {rate:.4f} Mpaths/s 1-core")


# (name, scene, res, spp): high-spp goldens for the BIAS gates — the
# two hardest scenes relied only on noise-calibrated low-spp gates,
# which a smooth few-percent estimator bias would pass (VERDICT r4
# missing #3). Renders once, pinned by tests/test_northstar.py.
HISPP = [
    ("hetvol", f"{REF}/volpath_test/hetvol.xml", 48, 4096),
    ("sponza", f"{REF}/sponza/sponza.xml", 64, 4096),
]


def stage_hispp():
    os.makedirs(GOLD, exist_ok=True)
    for name, scene, res, spp in HISPP:
        out = os.path.join(GOLD, f"{name}_hispp.npz")
        if os.path.exists(out):
            log(f"hispp/{name}: exists, skip")
            continue
        log(f"hispp/{name}: {res}x{res} @{spp}spp ...")
        xml = patch_scene(scene, os.path.join(WORK, f"hs_{name}.xml"),
                          spp=spp, width=res, height=res)
        img, s = run_ref(xml, os.path.join(WORK, f"hs_{name}.pfm"))
        np.savez_compressed(out, img=img, res=res, spp=spp,
                            render_seconds=s)
        log(f"hispp/{name}: mean={img.mean():.4f} took {s:.1f}s")


STAGES = {"goldens": stage_goldens, "aux": stage_aux,
          "northstar": stage_northstar, "baselines": stage_baselines,
          "hispp": stage_hispp}

if __name__ == "__main__":
    os.makedirs(WORK, exist_ok=True)
    which = sys.argv[1:] or ["aux", "goldens", "baselines", "northstar"]
    for w in which:
        STAGES[w]()
    log("all done")
