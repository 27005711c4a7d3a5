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
