"""Microbenchmark: VPU throughput of the EKF downdate primitives.

Answers three design questions for the per-world-unique fused rollout:
1. elem-op throughput of back-to-back rank-2 downdates on (DP, DP, BL)
   (the current kernel's dominant op) — is the kernel already at peak?
2. does fusing R rank-1 updates into one read-modify-write pass beat R
   separate passes (ld/st amortization) — is a factor-ring flush design
   worth it?
3. cost of a per-lane dynamic column gather from (DP, DP, BL)
   (take_along_axis) — is measurement compaction affordable?
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DP, BL = 48, 256
STEPS = 100000


def bench(name, fn, *args, reps=3, work_elems=None):
    # NB: block_until_ready is unreliable through the axon tunnel; force a
    # device->host fetch to really synchronize (see bench.py).
    np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    el = (time.perf_counter() - t0) / reps
    rate = (work_elems / el / 1e9) if work_elems else 0.0
    print(f"{name:34s} {el*1e3:8.2f} ms   {rate:9.2f} G elem-updates/s")
    return el


def make_rank_kernel(rank_per_pass, passes):
    """passes × (read P, apply rank_per_pass rank-1 FMAs, write P)."""

    def kernel(k_ref, h_ref, p_in_ref, p_ref):
        del p_in_ref  # aliased to p_ref
        def body(i, _):
            p = p_ref[:, :, :]
            for r in range(rank_per_pass):
                p = p - k_ref[r][:, None, :] * h_ref[r][None, :, :]
            p_ref[:, :, :] = p
            return 0
        jax.lax.fori_loop(0, passes, body, 0)

    @jax.jit
    def run(k, h, p):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DP, DP, BL), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={2: 0},
        )(k, h, p)
        return jnp.sum(out)  # scalar fetch only — the tunnel is slow

    return run


def make_gather_kernel(n_gathers):
    """per-lane dynamic column gather: out[a, w] = P[a, idx[w], w]."""

    def kernel(p_ref, idx_ref, out_ref):
        def body(i, _):
            idx = idx_ref[0, :]  # (BL,) int32 per-lane column index
            p = p_ref[:, :, :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (DP, DP, BL), 1)
            sel = (iota == idx[None, None, :]).astype(jnp.float32)
            out_ref[:, :] = out_ref[:, :] + jnp.sum(p * sel, axis=1)
            return 0
        jax.lax.fori_loop(0, n_gathers, body, 0)

    @jax.jit
    def run(p, idx):
        return jnp.sum(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DP, BL), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(p, idx))

    return run


def make_take_kernel(n_gathers):
    def kernel(p_ref, idx_ref, out_ref):
        def body(i, _):
            idx = idx_ref[:, :]  # (1, BL)
            p = p_ref[:, :, :]
            g = jnp.take_along_axis(
                p, idx[None, :, :].astype(jnp.int32), axis=1
            )  # (DP, 1, BL)
            out_ref[:, :] = out_ref[:, :] + g[:, 0, :]
            return 0
        jax.lax.fori_loop(0, n_gathers, body, 0)

    @jax.jit
    def run(p, idx):
        return jnp.sum(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DP, BL), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(p, idx))

    return run


def main():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((DP, DP, BL)) * 1e-3, jnp.float32)
    idx = jnp.asarray(rng.integers(0, DP, (1, BL)), jnp.int32)

    print(f"shapes: P=({DP},{DP},{BL}) f32; per pass = {DP*DP*BL} elems")
    # 1/2: rank-R fused passes, same total rank (STEPS rank-1s)
    for rank in (1, 2, 4, 8, 16):
        passes = STEPS // rank
        k = jnp.asarray(rng.standard_normal((rank, DP, BL)) * 1e-4, jnp.float32)
        h = jnp.asarray(rng.standard_normal((rank, DP, BL)) * 1e-4, jnp.float32)
        run = make_rank_kernel(rank, passes)
        bench(
            f"rank-{rank:<2d} fused x{passes} passes",
            run, k, h, p,
            work_elems=STEPS * DP * DP * BL,
        )

    # 3: per-lane dynamic column gather
    for name, maker in (("select-tree gather", make_gather_kernel),
                        ("take_along_axis gather", make_take_kernel)):
        try:
            run = maker(20000)
            bench(f"{name} x20000", run, p, idx,
                  work_elems=20000 * DP * DP * BL)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
