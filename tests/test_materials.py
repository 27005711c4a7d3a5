"""BSDF sample ↔ pdf consistency (reference analogue: tests/materials.cpp).

The reference finite-differences the Jacobian of each sampling lobe
separately. Multi-lobe mixtures make per-lobe Jacobians awkward, so we
use a stronger statistical identity instead: for any test function g,
   E_u[ g(sample(u)) ]  ==  ∫_{S^2} g(ω) pdf(ω) dω,
estimating the RHS by uniform-sphere Monte Carlo. We compare a basis of
10 quadratic spherical moments within sampling error. This catches both
wrong pdfs and wrong sampling maps, including the mixture weighting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lajolla_tpu.materials as mats
from lajolla_tpu.scene.geometry import Hit
from lajolla_tpu.core.math import make_frame, normalize
from lajolla_tpu.scene import types as T
from lajolla_tpu.testing import make_single_material_scene


def make_hit(normal=(0.0, 0.0, 1.0)):
    n = normalize(jnp.asarray(normal, jnp.float32))
    frame = make_frame(n)
    z = jnp.float32
    return Hit(valid=jnp.bool_(True), t=z(1), position=jnp.zeros(3),
               geometry_normal=n, frame=frame, uv=jnp.array([0.3, 0.6]),
               st=jnp.zeros(2), mean_curvature=z(0), inv_uv_size=z(1),
               footprint=z(0), shape_id=jnp.int32(0), prim_id=jnp.int32(0),
               material_id=jnp.int32(0), light_id=jnp.int32(-1),
               interior_med=jnp.int32(-1), exterior_med=jnp.int32(-1))


def _moments(dirs):
    """(N,3) → (N,10) quadratic moment basis."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    return np.stack([np.ones_like(x), x, y, z, x * y, x * z, y * z,
                     x * x, y * y, z * z], axis=1)


def check_sample_pdf_statistical(scene, dir_in, n=200_000, seed=0,
                                 n_probes=8, rel_tol=0.08):
    """Cone-mass test: around probe directions drawn from the sampler
    itself, the empirical fraction of samples falling in a cone must match
    the pdf integrated over that cone (MC with uniform-in-cone points).
    Robust for arbitrarily sharp lobes where uniform-sphere moment
    matching fails."""
    hit = make_hit()
    mat_id = jnp.int32(0)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)

    u2 = jax.random.uniform(k1, (n, 2))
    w = jax.random.uniform(k2, (n,))
    rec = jax.jit(jax.vmap(
        lambda u2, w: mats.sample_bsdf(scene, mat_id, dir_in, hit, u2, w)
    ))(u2, w)
    dirs = np.asarray(rec.dir_out)
    valid = np.asarray(rec.valid)
    dirs_v = dirs[valid]
    assert dirs_v.shape[0] > n // 2

    pdf_fn = jax.jit(jax.vmap(
        lambda d: mats.pdf_bsdf(scene, mat_id, dir_in, d, hit)))

    rng = np.random.default_rng(seed)
    probe_ids = rng.integers(0, dirs_v.shape[0], n_probes)
    m = 50_000
    for pid in probe_ids:
        ctr = dirs_v[pid]
        for delta in (0.08, 0.2, 0.5):
            cosd = np.cos(delta)
            emp = float(((dirs_v @ ctr > cosd).sum()) / n)
            if emp * n > 2000:  # enough mass for a tight comparison
                break
        if emp * n < 500:
            continue  # isolated sliver (e.g. rare lobe) — skip
        z = rng.uniform(cosd, 1, m)
        phi = rng.uniform(0, 2 * np.pi, m)
        r = np.sqrt(1 - z * z)
        a = np.array([0.0, 1.0, 0.0])
        if abs(ctr @ a) > 0.9:
            a = np.array([1.0, 0.0, 0.0])
        t = np.cross(a, ctr)
        t /= np.linalg.norm(t)
        b = np.cross(ctr, t)
        cone = (r * np.cos(phi))[:, None] * t + \
            (r * np.sin(phi))[:, None] * b + z[:, None] * ctr
        pdfv = np.asarray(pdf_fn(jnp.asarray(cone, jnp.float32)))
        assert np.isfinite(pdfv).all() and (pdfv >= 0).all()
        pred = float(pdfv.mean() * 2 * np.pi * (1 - cosd))
        emp_se = np.sqrt(emp * (1 - emp) / n)
        assert abs(emp - pred) < rel_tol * max(emp, pred) + 4 * emp_se, \
            f"cone at {ctr} delta={delta}: empirical={emp} predicted={pred}"


CASES = [
    ('diffuse', None),
    ('roughplastic', None),
    ('roughdielectric', None),
    ('disneydiffuse', None),
    ('disneymetal', None),
    ('disneymetal', {T.P_ANISOTROPIC: 0.8}),
    ('disneyglass', None),
    ('disneyclearcoat', None),
    ('disneysheen', None),
    ('disneybsdf', None),
    ('disneybsdf', {T.P_SPEC_TRANS: 0.7, T.P_METALLIC: 0.2,
                    T.P_CLEARCOAT: 0.8, T.P_SHEEN: 0.5}),
]


@pytest.mark.parametrize("mat,params", CASES)
def test_material_sample_pdf(mat, params):
    scene = make_single_material_scene(mat, params=params)
    dir_in = normalize(jnp.array([0.3, -0.2, 0.9]))
    check_sample_pdf_statistical(scene, dir_in)


@pytest.mark.parametrize("mat", ['roughdielectric', 'disneyglass'])
def test_transmissive_from_inside(mat):
    scene = make_single_material_scene(mat)
    dir_in = normalize(jnp.array([0.2, 0.1, -0.95]))  # from inside
    check_sample_pdf_statistical(scene, dir_in)


def test_lambertian_energy_conservation():
    """Integral of eval over the hemisphere == albedo for Lambertian."""
    scene = make_single_material_scene('diffuse')
    hit = make_hit()
    dir_in = jnp.array([0.0, 0.0, 1.0])
    rng = np.random.default_rng(3)
    n = 4096
    u = rng.uniform(size=(n, 2))
    z = u[:, 0]
    r = np.sqrt(1 - z ** 2)
    phi = 2 * np.pi * u[:, 1]
    dirs = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1),
                       jnp.float32)
    f = jax.vmap(lambda d: mats.eval_bsdf(scene, jnp.int32(0), dir_in, d,
                                          hit))(dirs)
    integral = np.asarray(f).mean(0) * 2 * np.pi
    assert np.allclose(integral, 0.5, atol=0.05)  # albedo 0.5


@pytest.mark.parametrize("mat,params", CASES)
def test_eval_pdf_positivity_coupling(mat, params):
    """Where eval > 0 on the sampled support, pdf must be > 0 (else the
    estimator would be biased)."""
    scene = make_single_material_scene(mat, params=params)
    hit = make_hit()
    dir_in = normalize(jnp.array([0.3, -0.2, 0.9]))
    key = jax.random.PRNGKey(1)
    u2 = jax.random.uniform(key, (2000, 2))
    w = jax.random.uniform(key, (2000,))
    rec = jax.vmap(lambda u2, w: mats.sample_bsdf(
        scene, jnp.int32(0), dir_in, hit, u2, w))(u2, w)
    pdf = np.asarray(jax.vmap(lambda d: mats.pdf_bsdf(
        scene, jnp.int32(0), dir_in, d, hit))(rec.dir_out))
    f = np.asarray(jax.vmap(lambda d: mats.eval_bsdf(
        scene, jnp.int32(0), dir_in, d, hit))(rec.dir_out))
    valid = np.asarray(rec.valid)
    # Bias condition: wherever eval is nonzero on sampled directions, the
    # pdf must be nonzero (samplers MAY produce dirs with f=pdf=0, e.g.
    # below-horizon microfacet reflections — the integrator rejects them).
    nonzero_f = valid & (f.max(axis=1) > 1e-9)
    assert (pdf[nonzero_f] > 0).all()
