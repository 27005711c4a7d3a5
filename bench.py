"""Benchmark driver: renders the headline workload (cbox 512x512, path
integrator) and reports throughput in Mpaths/sec/chip.

Baseline note (BASELINE.md): the reference publishes no numbers and its
prebuilt Embree binaries are stripped from this mirror, so the 32-core
CPU baseline cannot be measured here. We use an estimate of 2.0 Mpaths/s
for a 32-core CPU run of the reference (fp64, explicitly non-vectorized
per its handout) as the vs_baseline denominator.

Prints exactly one JSON line.
"""

import dataclasses
import json
import sys
import time

CPU_BASELINE_MPATHS = 2.0
SCENE = "/root/reference/scenes/cbox/cbox.xml"
TIMED_SPP = 16


def main():
    import jax
    from lajolla_tpu.scene.parser import parse_scene
    from lajolla_tpu.integrators.path import _render_block

    scene, options = parse_scene(SCENE)
    options = dataclasses.replace(options, samples_per_pixel=256)
    w, h = scene.meta.width, scene.meta.height

    import numpy as np
    # warmup / compile (same static shape as the timed run). NB: the timed
    # runs force a device->host transfer — block_until_ready can return
    # early through the axon relay.
    np.asarray(_render_block(scene, options, 0, 0, TIMED_SPP))

    ts = []
    for i in range(3):
        t0 = time.time()
        np.asarray(_render_block(scene, options, 0, (i + 1) * TIMED_SPP,
                                 TIMED_SPP))
        ts.append(time.time() - t0)
    dt = min(ts)

    paths = w * h * TIMED_SPP
    mpaths = paths / dt / 1e6
    print(json.dumps({
        "metric": "cbox_512x512_path_Mpaths_per_sec_per_chip",
        "value": round(mpaths, 4),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths / CPU_BASELINE_MPATHS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
