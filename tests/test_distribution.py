"""Discrete distribution sampling statistics (reference: table_dist usage)."""

import jax
import jax.numpy as jnp
import numpy as np

from lajolla_tpu.core.distribution import (build_cdf_1d, build_cdf_2d,
                                           build_segmented_cdf, sample_cdf,
                                           sample_cdf_2d, sample_segmented)


def test_cdf_1d_frequencies():
    w = np.array([1.0, 3.0, 0.0, 6.0])
    pmf, cdf = build_cdf_1d(w)
    assert np.allclose(pmf, [0.1, 0.3, 0.0, 0.6])
    u = jnp.asarray(np.random.default_rng(0).uniform(size=20000),
                    jnp.float32)
    idx = jax.vmap(lambda u: sample_cdf(jnp.asarray(cdf, jnp.float32), u))(u)
    counts = np.bincount(np.asarray(idx), minlength=4) / 20000
    assert np.allclose(counts, pmf, atol=0.02)


def test_segmented_staircase():
    w = np.array([1.0, 1.0, 2.0, 4.0, 4.0])  # seg0: [0,2), seg1: [2,5)
    pmf, stair = build_segmented_cdf(w, [0, 2], [2, 3])
    stair = jnp.asarray(stair, jnp.float32)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(size=10000), jnp.float32)
    # segment 1: items 2,3,4 with probs 0.2,0.4,0.4
    idx = jax.vmap(lambda u: sample_segmented(stair, jnp.int32(1), u))(u)
    counts = np.bincount(np.asarray(idx), minlength=5) / 10000
    assert counts[0] == counts[1] == 0
    assert np.allclose(counts[2:], [0.2, 0.4, 0.4], atol=0.02)
    # segment 0: only items 0,1
    idx0 = jax.vmap(lambda u: sample_segmented(stair, jnp.int32(0), u))(u)
    c0 = np.bincount(np.asarray(idx0), minlength=5) / 10000
    assert np.allclose(c0[:2], [0.5, 0.5], atol=0.02) and c0[2:].sum() == 0


def test_cdf_2d_marginals():
    rng = np.random.default_rng(2)
    f = rng.uniform(size=(8, 16))
    d = build_cdf_2d(f)
    marg = jnp.asarray(d['marg_cdf'], jnp.float32)
    cond = jnp.asarray(d['cond_cdf'], jnp.float32)
    u = jnp.asarray(rng.uniform(size=(20000, 2)), jnp.float32)
    rows, cols, _ = jax.vmap(lambda u: sample_cdf_2d(marg, cond, u))(u)
    counts = np.zeros((8, 16))
    np.add.at(counts, (np.asarray(rows), np.asarray(cols)), 1)
    counts /= counts.sum()
    expect = f / f.sum()
    assert np.abs(counts - expect).max() < 0.01


def test_alias_table_matches_weights():
    """Alias draws (build_alias + sample_alias) reproduce the weight
    distribution, and the recovered uniforms stay U[0,1)."""
    import numpy as np
    from lajolla_tpu.core.distribution import build_alias, sample_alias
    rng = np.random.default_rng(5)
    w = rng.uniform(0.0, 1.0, size=37) ** 3
    w[7] = 0.0
    tab = jnp.asarray(build_alias(w))
    n = 200000
    u0 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    idx, du, dv = jax.vmap(lambda a, b: sample_alias(tab, a, b))(u0, u1)
    counts = np.bincount(np.asarray(idx), minlength=37) / n
    probs = w / w.sum()
    np.testing.assert_allclose(counts, probs, atol=0.004)
    assert counts[7] == 0.0
    du, dv = np.asarray(du), np.asarray(dv)
    assert (du >= 0).all() and (du < 1).all()
    assert (dv >= 0).all() and (dv < 1).all()
    # recovered uniforms are uniform (moments)
    assert abs(du.mean() - 0.5) < 0.01 and abs(dv.mean() - 0.5) < 0.01
