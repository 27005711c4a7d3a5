"""Benchmark driver: renders the headline workload (cbox 512x512, path
integrator) and reports throughput in Mpaths/sec/chip.

Baseline (measured, see BASELINE.md "Measured CPU baseline"): the
reference publishes no numbers and its prebuilt Embree binaries are
stripped from the mirror, so round 1 used a 2.0 Mpaths/s guess. Round 2
built the actual reference sources against a BVH shim
(tools/ref_baseline/) and measured the exact headline workload:
cbox 512x512 @ 4 spp in 7.06 s single-core = 0.1485 Mpaths/s/core.
The 32-core baseline is that x32 (the reference's tile-parallel design
scales ~linearly: disjoint film tiles, zero shared mutable state,
render.cpp:75-98) = 4.75 Mpaths/s. baseline_estimated stays true
because of the single-core->32-core extrapolation (this box has 1 core).

Prints exactly one JSON line.
"""

import dataclasses
import json
import sys
import time

CPU_BASELINE_MPATHS = 4.75
SCENE = "/root/reference/scenes/cbox/cbox.xml"
# Timed at the headline workload's own launch size (render_path uses
# 256-spp single launches for fused-kernel scenes); each timed run
# includes the film readback through the axon tunnel.
TIMED_SPP = 256


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
        "baseline_estimated": True,
        "baseline_mpaths": CPU_BASELINE_MPATHS,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
