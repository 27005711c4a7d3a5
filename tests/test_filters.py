"""Filter importance-sampling consistency (reference: tests/filter.cpp) —
the Jacobian determinant of the warp must equal 1/pdf at the warped
point. We use autodiff instead of finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lajolla_tpu.scene.camera import sample_filter
from lajolla_tpu.scene.types import FILTER_BOX, FILTER_TENT, FILTER_GAUSSIAN

PI = np.pi


def filter_pdf(ftype, param, xy):
    x, y = xy
    if ftype == FILTER_BOX:
        w = param
        inside = (abs(x) <= w / 2) and (abs(y) <= w / 2)
        return (1.0 / (w * w)) if inside else 0.0
    if ftype == FILTER_TENT:
        h = param / 2
        def t1(v):
            return max(0.0, (1 - abs(v) / h) / h)
        return t1(x) * t1(y)
    if ftype == FILTER_GAUSSIAN:
        s = param
        return float(np.exp(-(x * x + y * y) / (2 * s * s)) /
                     (2 * PI * s * s))
    raise ValueError


@pytest.mark.parametrize("ftype,param", [
    (FILTER_BOX, 1.0), (FILTER_BOX, 2.5),
    (FILTER_TENT, 2.0), (FILTER_TENT, 1.0),
    (FILTER_GAUSSIAN, 0.5), (FILTER_GAUSSIAN, 1.5),
])
def test_filter_jacobian(ftype, param):
    rng = np.random.default_rng(42)
    f = lambda u: sample_filter(ftype, param, u)
    jac = jax.jacfwd(f)
    for _ in range(20):
        u = jnp.asarray(rng.uniform(0.02, 0.98, size=2), jnp.float32)
        xy = np.asarray(f(u))
        J = np.asarray(jac(u))
        det = abs(np.linalg.det(J))
        pdf = filter_pdf(ftype, param, xy)
        assert pdf > 0
        assert det * pdf == pytest.approx(1.0, rel=2e-2), \
            f"u={u} xy={xy} det={det} pdf={pdf}"
