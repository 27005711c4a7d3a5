"""Generate golden thumbnails for the image-gate regression tests.

Renders each BASELINE scene at low resolution / high spp with the
current engines and stores the result + a calibrated rel-RMSE threshold
in tests/golden/<name>.npz. The threshold is set from an independent
probe render (different seed, the test's spp) so the gate sits ~2x above
expected Monte-Carlo noise — tight enough that a sign-flipped MIS weight
or a broken estimator fails, loose enough that RNG-stream differences
between engines pass.

Run on CPU:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
             python tools/make_goldens.py
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from lajolla_tpu.render import render                      # noqa: E402
from lajolla_tpu.scene.compile import compile_scene       # noqa: E402
from lajolla_tpu.scene.parser import parse_scene_to_builder  # noqa: E402

REF = "/root/reference/scenes"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

# (name, scene path, res, golden spp, test spp)
SCENES = [
    ("cbox", f"{REF}/cbox/cbox.xml", 64, 1024, 64),
    ("veach_mi", f"{REF}/veach_mi/mi.xml", 64, 1024, 64),
    ("vol_cbox", f"{REF}/volpath_test/vol_cbox.xml", 48, 512, 32),
    ("hetvol", f"{REF}/volpath_test/hetvol.xml", 32, 256, 32),
    ("matpreview", f"{REF}/matpreview/matpreview.xml", 64, 256, 32),
    ("disney_bsdf", f"{REF}/disney_bsdf_test/disney_bsdf.xml", 64, 512, 64),
]


def _down4(img):
    """4x4 box downsample: averages Monte-Carlo noise ~4x while keeping
    region-level structure, so the gate measures estimator bias (a
    sign-flipped MIS weight shifts a whole region) not per-pixel noise."""
    h, w, c = img.shape
    return img[:h - h % 4, :w - w % 4].reshape(
        h // 4, 4, w // 4, 4, c).mean(axis=(1, 3))


def rel_rmse(a, b):
    """Relative RMSE on 4x4-downsampled images with a luminance floor."""
    a, b = _down4(a), _down4(b)
    eps = 0.1 * float(b.mean()) + 1e-6
    return float(np.sqrt(np.mean((a - b) ** 2 / (b ** 2 + eps ** 2))))


def load_lowres(path, res):
    b = parse_scene_to_builder(path)
    b.camera.width = res
    b.camera.height = res
    return compile_scene(b), b.options


def main():
    os.makedirs(OUT, exist_ok=True)
    only = set(sys.argv[1:])
    for name, path, res, gspp, tspp in SCENES:
        if only and name not in only:
            continue
        print(f"[{name}] render {res}x{res} golden @{gspp}spp ...",
              flush=True)
        scene, opts = load_lowres(path, res)
        gold = np.asarray(render(
            scene, dataclasses.replace(opts, samples_per_pixel=gspp),
            seed=0))
        print(f"[{name}] probe @{tspp}spp seed 1 ...", flush=True)
        probe = np.asarray(render(
            scene, dataclasses.replace(opts, samples_per_pixel=tspp),
            seed=1))
        err = rel_rmse(probe, gold)
        thresh = max(2.0 * err, 0.02)
        np.savez_compressed(
            os.path.join(OUT, f"{name}.npz"), img=gold.astype(np.float32),
            res=res, golden_spp=gspp, test_spp=tspp, probe_err=err,
            thresh=thresh)
        print(f"[{name}] mean={gold.mean():.4f} probe_err={err:.4f} "
              f"thresh={thresh:.4f}", flush=True)


if __name__ == "__main__":
    main()
