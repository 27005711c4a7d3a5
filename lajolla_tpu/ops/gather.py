"""Fast device-side table lookup.

TPU dynamic gathers run at ~100M rows/s regardless of row width, which
makes per-lane scene-table lookups the wavefront bottleneck. Two fixes,
both here:

1. merge many narrow lookups into ONE wide-row gather (cost is per row,
   not per element), and
2. for small tables, replace the gather with a one-hot matmul on the
   MXU — exact (one-hot rows are 0/1; HIGHEST precision keeps the table
   values fp32-exact) and ~2-4x faster again.
"""

import jax
import jax.numpy as jnp

ONEHOT_LIMIT = 512


def fast_gather(table, idx, onehot_limit=ONEHOT_LIMIT):
    """table: (T, D) or (T,); idx: any int shape. Returns rows at idx.
    Exact for all inputs (one-hot path uses HIGHEST-precision matmul)."""
    squeeze = table.ndim == 1
    if squeeze:
        table = table[:, None]
    T = table.shape[0]
    if T <= onehot_limit and jnp.issubdtype(table.dtype, jnp.floating):
        oh = jax.nn.one_hot(idx, T, dtype=jnp.float32)
        out = jax.lax.dot_general(oh, table.astype(jnp.float32),
                                  (((oh.ndim - 1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST)
        out = out.astype(table.dtype)
    else:
        out = table[idx]
    return out[..., 0] if squeeze else out
