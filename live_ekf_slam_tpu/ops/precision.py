"""Precision-pinned matmul helpers.

On TPU, the default matmul precision feeds the MXU with bfloat16 inputs
(~3 decimal digits). That is the right trade for large neural-net matmuls but
catastrophically wrong for Kalman covariance algebra: a 0.3% relative error on
a covariance insertion block was observed with default precision, versus 6e-8
at HIGHEST. Every accuracy-critical contraction in the filters and the
pose-graph solver goes through these wrappers; bulk elementwise work (the vast
majority of the hot path) runs on the VPU at true fp32 regardless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def dot32(a, b):
    """jnp.matmul at full fp32 MXU precision."""
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum32(subscripts, *operands):
    """jnp.einsum at full fp32 MXU precision."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)


def sel_cols(dim, li, k: int = 2):
    """(dim, k) one-hot selection matrix for columns (li, ..., li+k-1).

    Replaces per-world dynamic_slice/dynamic_update_slice in the batched
    filter math: under vmap those lower to gather/scatter with batched start
    indices, which are pathologically slow on TPU (the round-1 XLA path ran
    at ~2 steps/s/world because of them). With one-hot selection every
    dynamic-index read becomes a small batched matmul and every write becomes
    masked outer products — plain fused VPU work. Out-of-range li yields zero
    columns (reads give 0, writes become no-ops), which callers guard anyway.
    """
    iota = jnp.arange(dim)
    return jnp.stack(
        [(iota == li + j).astype(jnp.float32) for j in range(k)], axis=1
    )
