"""Volume/medium/phase unit tests (reference analogues: volume.h lookup
semantics, phase function normalization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lajolla_tpu.integrators.media import (get_majorant, get_sigma_a,
                                           get_sigma_s, lookup_volume,
                                           phase_eval, phase_pdf,
                                           phase_sample)
from lajolla_tpu.scene.parser import parse_scene

REF = "/root/reference/scenes"


@pytest.fixture(scope="module")
def hetvol_scene():
    sc, _ = parse_scene(f"{REF}/volpath_test/hetvol.xml")
    return sc


def test_grid_lookup_inside_outside(hetvol_scene):
    sc = hetvol_scene
    med = jnp.int32(0)
    dvol = sc.med_density_vol[0]
    pmin = np.asarray(sc.vol_pmin[dvol])
    pmax = np.asarray(sc.vol_pmax[dvol])
    center = jnp.asarray((pmin + pmax) / 2, jnp.float32)
    outside = jnp.asarray(pmax + 1.0, jnp.float32)
    v_in = np.asarray(lookup_volume(sc, dvol, center))
    v_out = np.asarray(lookup_volume(sc, dvol, outside))
    assert (v_in >= 0).all() and np.isfinite(v_in).all()
    assert np.allclose(v_out, 0.0)   # outside the grid bbox → 0 (volume.h:48)
    # majorant bounds the density everywhere (grid max)
    maxv = np.asarray(sc.vol_maxval[dvol])
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(pmin, pmax, size=(256, 3)), jnp.float32)
    dens = np.asarray(jax.vmap(lambda p: lookup_volume(sc, dvol, p))(pts))
    assert (dens <= maxv + 1e-4).all()


def test_majorant_ray_gated(hetvol_scene):
    sc = hetvol_scene
    med = jnp.int32(0)
    dvol = sc.med_density_vol[0]
    pmin = np.asarray(sc.vol_pmin[dvol])
    pmax = np.asarray(sc.vol_pmax[dvol])
    center = jnp.asarray((pmin + pmax) / 2, jnp.float32)
    # ray through the grid: majorant = grid max; ray away: zero
    o = jnp.asarray(pmin - 5.0, jnp.float32)
    d_to = jnp.asarray((np.asarray(center) - np.asarray(o)), jnp.float32)
    d_to = d_to / jnp.linalg.norm(d_to)
    m_hit = np.asarray(get_majorant(sc, med, o, d_to, jnp.float32(1e9)))
    m_miss = np.asarray(get_majorant(sc, med, o, -d_to, jnp.float32(1e9)))
    assert (m_hit > 0).all()
    assert np.allclose(m_miss, 0.0)


def test_sigma_decomposition(hetvol_scene):
    """sigma_s + sigma_a == density (albedo-weighted split,
    media/heterogeneous.inl:12-21)."""
    sc = hetvol_scene
    med = jnp.int32(0)
    dvol = sc.med_density_vol[0]
    pmin = np.asarray(sc.vol_pmin[dvol])
    pmax = np.asarray(sc.vol_pmax[dvol])
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(pmin, pmax, size=(64, 3)), jnp.float32)
    ss = np.asarray(jax.vmap(lambda p: get_sigma_s(sc, med, p))(pts))
    sa = np.asarray(jax.vmap(lambda p: get_sigma_a(sc, med, p))(pts))
    dens = np.asarray(jax.vmap(lambda p: lookup_volume(sc, dvol, p))(pts))
    np.testing.assert_allclose(ss + sa, dens, rtol=1e-5, atol=1e-6)


def test_supervoxel_majorant_conservative(hetvol_scene):
    """Every supervoxel majorant (scene/compile.py _super_majorants)
    bounds the trilinear density at random points inside its cell."""
    sc = hetvol_scene
    dvol = int(sc.med_density_vol[0])
    pmin = np.asarray(sc.vol_pmin[dvol])
    pmax = np.asarray(sc.vol_pmax[dvol])
    sres = np.asarray(sc.svox_res[dvol])
    soff = int(sc.svox_offset[dvol])
    svox = np.asarray(sc.svox_data)
    rng = np.random.default_rng(7)
    pts = rng.uniform(pmin, pmax, size=(2048, 3)).astype(np.float32)
    dens = np.asarray(jax.vmap(
        lambda p: lookup_volume(sc, jnp.int32(dvol), p))(
            jnp.asarray(pts)))
    pn = (pts - pmin) / (pmax - pmin)
    cell = np.clip((pn * sres).astype(np.int64), 0, sres - 1)
    idx = soff + (cell[:, 2] * sres[1] + cell[:, 1]) * sres[0] + cell[:, 0]
    maj = svox[idx][:, :3]
    assert (dens <= maj + 1e-4).all()


def test_empty_skip_sound(hetvol_scene):
    """The empty-skip channel (scene/compile.py _empty_skip) is sound:
    a cell with skip = s > 0 must be empty itself and have NO occupied
    supervoxel within Chebyshev distance s-1 — the invariant
    volpath._majorant_segment's expanded-box exit relies on."""
    sc = hetvol_scene
    dvol = int(sc.med_density_vol[0])
    gx, gy, gz = np.asarray(sc.svox_res[dvol])
    soff = int(sc.svox_offset[dvol])
    rows = np.asarray(sc.svox_data)[soff:soff + gx * gy * gz]
    occ = (rows[:, :3].max(axis=1) > 0).reshape(gz, gy, gx)
    skip = rows[:, 3].reshape(gz, gy, gx)
    assert skip.max() >= 1          # hetvol's grid has empty space
    assert (skip[occ] == 0).all()
    for (z, y, x) in np.argwhere(skip >= 1):
        s = int(skip[z, y, x])
        nb = occ[max(z - s + 1, 0):z + s, max(y - s + 1, 0):y + s,
                 max(x - s + 1, 0):x + s]
        assert not nb.any(), (z, y, x, s)


def test_ratio_tracking_transmittance_unbiased(hetvol_scene):
    """E[ratio-tracked transmittance] through the real smoke grid ==
    exp(-integral sigma_t), with the supervoxel DDA majorants
    (volpath._free_flight, with_scatter=False). A majorant below sigma_t
    anywhere, or a mis-accounted segment boundary, biases this."""
    from lajolla_tpu.integrators.volpath import _free_flight
    from lajolla_tpu.scene.parser import parse_scene
    _, options = parse_scene(f"{REF}/volpath_test/hetvol.xml")
    sc = hetvol_scene
    dvol = int(sc.med_density_vol[0])
    pmin = np.asarray(sc.vol_pmin[dvol])
    pmax = np.asarray(sc.vol_pmax[dvol])
    ctr = (pmin + pmax) / 2
    org = jnp.asarray(ctr - np.array([0.0, 0.0, 2.0 * (pmax - pmin)[2]]),
                      jnp.float32)
    d = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    t_hit = jnp.float32(5.0 * (pmax - pmin)[2])

    # ground truth: dense quadrature of sigma_t along the ray
    ts = np.linspace(0.0, float(t_hit), 4001)
    pts = np.asarray(org)[None, :] + ts[:, None] * np.asarray(d)[None, :]
    sig = np.asarray(jax.vmap(
        lambda p: lookup_volume(sc, jnp.int32(dvol), p))(
            jnp.asarray(pts, jnp.float32)))[:, 0]
    tau = np.trapezoid(sig, ts)
    truth = np.exp(-tau)

    roots = jnp.arange(8192, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)

    def one(hs):
        trans, _tdp, tnp, _sc, _at, _rounds = _free_flight(
            sc, options, hs, org, d, jnp.int32(0), t_hit,
            with_scatter=False)
        # the unbiased transmittance estimate is trans / trans_nee_pdf
        # (the NEE completion divides by the pdf product) —
        # for a gray grid the ratio telescopes to prod(sigma_n/majorant)
        return trans[0] / jnp.maximum(tnp[0], 1e-30)

    est = float(jnp.mean(jax.vmap(one)(roots)))
    assert est == pytest.approx(truth, rel=0.05, abs=5e-4)


def test_residual_ratio_tracking_smooth_grid():
    """Residual ratio tracking (volpath._free_flight with_scatter=False,
    compile.py supervoxel minorants): on a smooth strictly-positive
    grid the per-supervoxel control sigma_c is large, so (1) the
    trans/tnp transmittance estimator must stay unbiased vs dense
    quadrature, and (2) tracking rounds must drop vs the zero-control
    process (the whole point — tentative collisions now arrive at the
    residual rate majorant - control). hetvol itself compiles the plain
    loop (meta.svox_ctrl False: its wispy grid has ~0 minima), so this
    synthetic grid is what gates the residual path."""
    import dataclasses
    import lajolla_tpu.scene.compile as C
    from lajolla_tpu.integrators.volpath import _free_flight
    from lajolla_tpu.scene.parser import parse_scene_to_builder

    b = parse_scene_to_builder(f"{REF}/volpath_test/hetvol.xml")
    v = b.volumes[0]
    z, y, x = v.grid.shape[:3]
    zz, yy, xx = np.meshgrid(np.linspace(0, 1, z), np.linspace(0, 1, y),
                             np.linspace(0, 1, x), indexing="ij")
    g = (40.0 + 10.0 * np.sin(6 * xx) * np.cos(5 * yy) + 8.0 * zz)
    v.grid = np.repeat(g[..., None].astype(np.float32), 3, axis=-1)
    sc = C.compile_scene(b)
    opts = b.options
    assert sc.meta.svox_ctrl   # smooth grid -> nontrivial minorants

    dvol = int(sc.med_density_vol[0])
    pmin = np.asarray(sc.vol_pmin[dvol])
    pmax = np.asarray(sc.vol_pmax[dvol])
    ctr = (pmin + pmax) / 2
    org = jnp.asarray(ctr - np.array([0.0, 0.0, 2.0 * (pmax - pmin)[2]]),
                      jnp.float32)
    d = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    t_hit = jnp.float32(5.0 * (pmax - pmin)[2])

    ts = np.linspace(0.0, float(t_hit), 4001)
    pts = np.asarray(org)[None, :] + ts[:, None] * np.asarray(d)[None, :]
    sig = np.asarray(jax.vmap(
        lambda p: lookup_volume(sc, jnp.int32(dvol), p))(
            jnp.asarray(pts, jnp.float32)))[:, 0]
    truth = np.exp(-np.trapezoid(sig, ts))

    roots = jnp.arange(8192, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)

    def run(scene):
        def one(hs):
            trans, _tdp, tnp, _sc, _at, rounds = _free_flight(
                scene, opts, hs, org, d, jnp.int32(0), t_hit,
                with_scatter=False)
            return trans[0] / jnp.maximum(tnp[0], 1e-30), rounds
        est, rounds = jax.vmap(one)(roots)
        return float(jnp.mean(est)), np.asarray(rounds)

    est_res, r_res = run(sc)
    assert est_res == pytest.approx(float(truth), rel=0.05, abs=5e-4)

    # zero the control columns (keeps meta.svox_ctrl, so the residual
    # code path runs with sigma_c = 0 == the plain process)
    svd = np.asarray(sc.svox_data).copy()
    svd[:, 4:7] = 0.0
    sc0 = dataclasses.replace(sc, svox_data=jnp.asarray(svd))
    est0, r0 = run(sc0)
    assert est0 == pytest.approx(float(truth), rel=0.05, abs=5e-4)
    # the win: tentative collisions arrive ~2.7x slower (residual ~18
    # vs majorant ~50 here); the remaining rounds are DDA segment
    # walks, which the control cannot remove. Measured 20.8 vs 35.0.
    assert r_res.mean() < 0.65 * r0.mean(), (r_res.mean(), r0.mean())


def test_hom_nee_transmittance_exact():
    """Homogeneous media carry control == sigma_t (volpath.
    _majorant_segment), so the NEE transmittance estimator is the exact
    closed form exp(-sigma_t * t) with NEE-process density 1 — replacing
    the reference's binary ratio-tracking outcome for homogeneous media
    (vol_path_tracing.h:384-404 with majorant == sigma_t): same
    expectation, zero variance, one loop iteration."""
    from lajolla_tpu.integrators.volpath import _free_flight
    sc, opts = parse_scene(f"{REF}/volpath_test/vol_cbox.xml")
    assert sc.meta.svox_ctrl
    from lajolla_tpu.integrators.media import MT_SA, MT_SS
    row = np.asarray(sc.med_tab)[0]
    sigma_t = row[MT_SA:MT_SA + 3] + row[MT_SS:MT_SS + 3]
    org = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    d = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    L = jnp.float32(0.7)
    roots = jnp.arange(64, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    trans, _tdp, tnp, _s, _a, rounds = jax.vmap(
        lambda hs: _free_flight(sc, opts, hs, org, d, jnp.int32(0), L,
                                with_scatter=False))(roots)
    np.testing.assert_allclose(
        np.asarray(trans),
        np.broadcast_to(np.exp(-sigma_t * float(L)), (64, 3)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tnp), 1.0, rtol=1e-6)
    assert int(np.asarray(rounds).max()) <= 1


@pytest.mark.parametrize("g", [0.0, 0.3, -0.7])
def test_phase_normalization(hetvol_scene, g):
    """Phase pdf integrates to 1 over the sphere; sample ↔ pdf agree on
    the mean cosine (= g for HG)."""
    sc = hetvol_scene
    import dataclasses
    from lajolla_tpu.integrators.media import MT_G, MT_PHASE
    tab = np.asarray(sc.med_tab).copy()
    tab[:, MT_PHASE] = 1.0
    tab[:, MT_G] = g
    sc = dataclasses.replace(
        sc, med_g=jnp.full_like(sc.med_g, g),
        med_phase_type=jnp.ones_like(sc.med_phase_type),
        med_tab=jnp.asarray(tab))
    med = jnp.int32(0)
    d_in = jnp.array([0.0, 0.0, 1.0])
    rng = np.random.default_rng(2)
    x = rng.normal(size=(20000, 3))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    pdfs = np.asarray(jax.vmap(
        lambda v: phase_pdf(sc, med, d_in, v))(jnp.asarray(x, jnp.float32)))
    assert pdfs.mean() * 4 * np.pi == pytest.approx(1.0, rel=0.03)
    u = jnp.asarray(rng.uniform(size=(20000, 2)), jnp.float32)
    dirs = np.asarray(jax.vmap(
        lambda u: phase_sample(sc, med, d_in, u))(u))
    mean_cos = (dirs @ np.asarray(d_in)).mean()
    # the reference parameterizes HG with +2g·dot(dir_in, dir_out) where
    # dir_in points BACK toward the previous vertex
    # (henyeygreenstein.inl:4-6): E[dot(dir_in, dir_out)] = -g.
    assert mean_cos == pytest.approx(-g, abs=0.02)
