"""End-to-end integrator correctness on analytic fixtures."""

import dataclasses

import numpy as np
import pytest

from lajolla_tpu.integrators.path import render_path
from lajolla_tpu.integrators.volpath import render_volpath
from lajolla_tpu.scene.types import RenderOptions
from lajolla_tpu.testing import make_furnace_scene, make_volume_scene


def test_furnace_closed():
    """Convex Lambertian sphere under uniform env L0: sphere-center pixels
    must be albedo * L0 (no self-interreflection on a convex body; the
    sphere nearly fills the frame at fov 30, so corners are background
    = exactly L0)."""
    albedo = 0.6
    scene = make_furnace_scene(albedo=albedo, res=16)
    opts = RenderOptions(integrator='path', samples_per_pixel=512,
                         max_depth=-1)
    img = np.asarray(render_path(scene, opts))
    assert np.isfinite(img).all()
    c = img.shape[0] // 2
    assert img[0, 0].mean() == pytest.approx(1.0, rel=0.01)
    assert img[-1, -1].mean() == pytest.approx(1.0, rel=0.01)
    assert img[c, c].mean() == pytest.approx(albedo, rel=0.03)


def test_furnace_direct_only():
    """max_depth=2 (direct lighting): sphere center = albedo * L0 too (the
    env light IS the direct light for a convex body)."""
    albedo = 0.5
    scene = make_furnace_scene(albedo=albedo, res=16)
    opts = RenderOptions(integrator='path', samples_per_pixel=512,
                         max_depth=2)
    img = np.asarray(render_path(scene, opts))
    c = img.shape[0] // 2
    assert img[c, c].mean() == pytest.approx(albedo, rel=0.03)


def test_volpath_energy_attenuation():
    """Emissive sphere in absorbing-only medium: center pixel ==
    L * exp(-sigma_a * dist) (single straight path, no scattering)."""
    sa, dist, L = 0.1, 5.0, 2.0
    scene = make_volume_scene(sigma_a=(sa,) * 3, sigma_s=(0.0,) * 3,
                              res=16, radiance=L)
    opts = RenderOptions(integrator='volpath', samples_per_pixel=256,
                         max_depth=-1)
    img = np.asarray(render_volpath(scene, opts))
    c = img.shape[0] // 2
    expected = L * np.exp(-sa * dist)
    # average a small center patch: the estimator is binary (0 or ~2) so a
    # single pixel at moderate spp is noisy
    patch = img[c - 2:c + 3, c - 2:c + 3].mean()
    assert patch == pytest.approx(expected, rel=0.04)


def test_volpath_scattering_runs():
    """Scattering medium smoke test: finite, nonzero, glow extends beyond
    the sphere silhouette."""
    scene = make_volume_scene(sigma_a=(0.02,) * 3, sigma_s=(0.2,) * 3,
                              g=0.3, res=24, radiance=2.0)
    opts = RenderOptions(integrator='volpath', samples_per_pixel=64,
                         max_depth=-1)
    img = np.asarray(render_volpath(scene, opts))
    assert np.isfinite(img).all()
    h = img.shape[0]
    corner = img[2, 2].mean()
    center = img[h // 2, h // 2].mean()
    assert center > 0.5
    assert corner > 1e-4  # in-scattered glow reaches off-silhouette pixels


def test_dense_film_add_matches_scatter():
    """The dense queue-stride film decompositions must equal scatter-add
    exactly in all three regimes (K-dense, reshape-dense, fallback)."""
    import jax.numpy as jnp
    import numpy as np
    from lajolla_tpu.integrators.path import _dense_film_add

    rng = np.random.default_rng(3)

    def check(n, lanes):
        # items stride by `lanes`, so pixel = item % n with item ≡ lane
        slots = rng.integers(0, 7, size=lanes)
        item = np.arange(lanes) + slots * lanes
        pixel = jnp.asarray(item % n, jnp.int32)
        contrib = jnp.asarray(rng.normal(size=(lanes, 3)), jnp.float32)
        film = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        want = np.asarray(film).copy()
        np.add.at(want, np.asarray(pixel), np.asarray(contrib))
        got = np.asarray(_dense_film_add(film, pixel, contrib, n, lanes))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    check(n=256, lanes=64)    # n % lanes == 0 (K dense masked adds)
    check(n=64, lanes=256)    # lanes % n == 0 (reshaped dense add)
    check(n=96, lanes=64)     # neither — scatter fallback


def test_bounce_cap_bias_negligible():
    """Gates the MAX_BOUNCES_CAP=64 deviation from the reference's
    unbounded max_depth=-1 loop (path_tracing.h:64-66; docs/PARITY.md
    'Path length is capped'). Worst-case deep-path fixture: closed
    emissive diffuse box with albedo 0.9 -> analytic equilibrium
    L = Le/(1-rho) = 3.0 and mean path length ~10 bounces. Truncating
    at 64 discards ~0.9^64 ~ 0.1% of the tail; a cap low enough to
    matter (e.g. 16 -> 18% missing energy) fails the 3% gate."""
    from lajolla_tpu.testing import make_white_box_scene
    scene = make_white_box_scene(albedo=0.9, emission=0.3, res=8)
    opts = RenderOptions(integrator='path', samples_per_pixel=256,
                         max_depth=-1)
    img = np.asarray(render_path(scene, opts))
    assert np.isfinite(img).all()
    assert img.mean() == pytest.approx(3.0, rel=0.03)
