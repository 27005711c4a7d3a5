"""BSDF sample ↔ pdf consistency (reference analogue: tests/materials.cpp),
done with autodiff instead of finite differences: for a sampled direction
s(u) on the sphere, pdf(s(u)) * sqrt(det(J^T J)) must equal 1 where J is
the 3x2 Jacobian d s / d u. Also checks eval/pdf positivity coupling and
energy conservation of the cosine-weighted eval."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lajolla_tpu.materials as mats
from lajolla_tpu.scene.geometry import Hit
from lajolla_tpu.core.math import make_frame, normalize
from tests.scene_fixtures import make_single_material_scene


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


def check_sample_pdf_consistency(scene, dir_in, n_checks=30, seed=0,
                                 rel=5e-2):
    hit = make_hit()
    rng = np.random.default_rng(seed)
    mat_id = jnp.int32(0)

    def s(u2, w):
        rec = mats.sample_bsdf(scene, mat_id, dir_in, hit, u2, w)
        return rec.dir_out, rec

    jac = jax.jacfwd(lambda u2, w: s(u2, w)[0], argnums=0)
    checked = 0
    for _ in range(n_checks):
        u2 = jnp.asarray(rng.uniform(0.05, 0.95, 2), jnp.float32)
        w = jnp.float32(rng.uniform())
        dir_out, rec = s(u2, w)
        if not bool(rec.valid):
            continue
        J = np.asarray(jac(u2, w))  # (3, 2)
        gram = J.T @ J
        det = np.sqrt(max(np.linalg.det(gram), 0.0))
        pdf = float(mats.pdf_bsdf(scene, mat_id, dir_in, dir_out, hit))
        if det < 1e-6 or pdf < 1e-5:
            continue  # degenerate/delta-ish regions skipped like the ref test
        assert pdf * det == pytest.approx(1.0, rel=rel), \
            f"u2={u2} w={w} pdf={pdf} 1/det={1.0/det}"
        checked += 1
    assert checked >= n_checks // 2


def test_lambertian_consistency():
    scene = make_single_material_scene('diffuse')
    dir_in = normalize(jnp.array([0.3, -0.2, 0.9]))
    check_sample_pdf_consistency(scene, dir_in)


def test_lambertian_energy_conservation():
    """Integral of eval over the hemisphere must be <= albedo (= albedo
    exactly for Lambertian: cos-weighted albedo/pi integrates to albedo)."""
    scene = make_single_material_scene('diffuse')
    hit = make_hit()
    dir_in = jnp.array([0.0, 0.0, 1.0])
    rng = np.random.default_rng(3)
    n = 4096
    # uniform hemisphere MC
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
