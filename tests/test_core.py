"""Core math tests (reference analogues: tests/frame.cpp, tests/matrix.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from lajolla_tpu.core.math import (coordinate_system, make_frame, normalize,
                                   to_local, to_world, reflect, refract, dot)
from lajolla_tpu.core import transform as xf


def test_frame_roundtrip():
    rng = np.random.default_rng(0)
    n = normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    fr = make_frame(n)
    v = normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
    v2 = to_world(fr, to_local(fr, v))
    assert np.allclose(v2, v, atol=1e-5)


def test_frame_orthonormal():
    rng = np.random.default_rng(1)
    n = normalize(jnp.asarray(rng.normal(size=(128, 3)), jnp.float32))
    t, b = coordinate_system(n)
    assert np.allclose(np.sum(np.asarray(t * b), -1), 0, atol=1e-5)
    assert np.allclose(np.sum(np.asarray(t * n), -1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(np.asarray(t), axis=-1), 1, atol=1e-5)


def test_reflect():
    n = jnp.array([0.0, 0.0, 1.0])
    w = normalize(jnp.array([1.0, 0.0, 1.0]))
    r = reflect(w, n)
    assert np.allclose(r, normalize(jnp.array([-1.0, 0.0, 1.0])), atol=1e-6)


def test_refract_snell():
    n = jnp.array([0.0, 0.0, 1.0])
    w = normalize(jnp.array([1.0, 0.0, 1.0]))
    eta = jnp.float32(1.5)
    wt, valid = refract(w, n, eta)
    assert bool(valid)
    sin_i = jnp.sqrt(1 - dot(w, n) ** 2)
    sin_t = jnp.sqrt(1 - dot(wt, n) ** 2)
    assert np.allclose(sin_i / sin_t, 1.5, atol=1e-4)


def test_transform_inverse():
    m = xf.translate([1, 2, 3]) @ xf.rotate(37.0, [1, 1, 0]) @ xf.scale([2, 2, 2])
    assert np.allclose(xf.inverse(m) @ m, np.eye(4), atol=1e-10)


def test_perspective_matches_reference_shape():
    p = xf.perspective(90.0)
    assert np.allclose(p[0, 0], 1.0, atol=1e-6)  # cot(45deg) = 1
    assert p[3, 2] == 1.0 and p[2, 3] == -1.0


def test_xform_normal():
    m = xf.scale([2.0, 1.0, 1.0])
    n = jnp.array([1.0, 0.0, 0.0])
    nt = xf.xform_normal(jnp.asarray(np.linalg.inv(m), jnp.float32), n)
    # normal of a plane x=c under x-stretch: stays x-direction, scaled by 1/2
    assert np.allclose(np.asarray(nt), [0.5, 0, 0], atol=1e-6)
