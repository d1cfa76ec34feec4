"""Probe: why are the UKF kernel ops far below the EKF downdate peak?

Compares, in one harness: the EKF rank-2 downdate (the 700 G elem-op/s
reference point from micro_downdate.py) at BL=128/256, then builds the
Joseph expression up term by term, and tries matvec reduction variants.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DUP = 48


def bench(name, fn, *args, passes, reps=3, per_pass_elems=None):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    el = (time.perf_counter() - t0) / reps
    us = el / passes * 1e6
    rate = (per_pass_elems * passes / el / 1e9) if per_pass_elems else 0.0
    print(f"{name:44s} {us:8.2f} us/pass   {rate:9.2f} G elem-op/s")
    return us


def make_downdate(bl, n_loop):
    def kernel(k_ref, h_ref, p_in_ref, p_ref):
        del p_in_ref

        def body(i, _):
            p = p_ref[:, :, :]
            p = p - k_ref[0][:, None, :] * h_ref[0][None, :, :]
            p = p - k_ref[1][:, None, :] * h_ref[1][None, :, :]
            p_ref[:, :, :] = p
            return 0

        jax.lax.fori_loop(0, n_loop, body, 0)

    @jax.jit
    def run(k, h, p):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DUP, DUP, bl), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={2: 0},
        )(k, h, p)
        return jnp.sum(out)

    return run


def make_joseph_n(bl, n_terms, n_loop):
    """Joseph expression truncated to the first n_terms outer products."""

    def kernel(k_ref, s_ref, p_in_ref, p_ref):
        del p_in_ref

        def body(i, _):
            k0 = k_ref[0]
            k1 = k_ref[1]
            c_r = k_ref[2]
            c_b = k_ref[3]
            s00 = s_ref[0:1, :]
            s01 = s_ref[1:2, :]
            s11 = s_ref[2:3, :]
            ko0 = k0[:, None, :]
            ko1 = k1[:, None, :]
            cro = c_r[:, None, :]
            cbo = c_b[:, None, :]
            kT0 = k0[None, :, :]
            kT1 = k1[None, :, :]
            crT = c_r[None, :, :]
            cbT = c_b[None, :, :]
            terms = [
                -(ko0 * crT),
                -(cro * kT0),
                -(ko1 * cbT),
                -(cbo * kT1),
                s00 * (ko0 * kT0),
                s11 * (ko1 * kT1),
                s01 * (ko0 * kT1 + ko1 * kT0),
            ]
            acc = p_ref[:, :, :]
            for t in terms[:n_terms]:
                acc = acc + t
            p_ref[:, :, :] = acc
            return 0

        jax.lax.fori_loop(0, n_loop, body, 0)

    @jax.jit
    def run(k, s, p):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DUP, DUP, bl), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={2: 0},
        )(k, s, p)
        return jnp.sum(out)

    return run


def make_matvec_axis(bl, axis, n_loop):
    """Reduce L*g along sublane (axis=1) vs axis0 (untiled)."""

    def kernel(l_ref, g_ref, out_ref):
        def body(i, _):
            if axis == 1:
                acc = jnp.sum(l_ref[:, :, :] * g_ref[0][None, :, :], axis=1)
            else:
                acc = jnp.sum(l_ref[:, :, :] * g_ref[0][:, None, :], axis=0)
            out_ref[:, :] = out_ref[:, :] + acc
            return 0

        out_ref[:, :] = jnp.zeros((DUP, bl), jnp.float32)
        jax.lax.fori_loop(0, n_loop, body, 0)

    @jax.jit
    def run(l0, g):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DUP, bl), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(l0, g)
        return jnp.sum(out)

    return run


def make_matvec_unrolled(bl, n_loop):
    """Accumulate over sublane-groups: manual unroll of the reduction as 48
    rank-1 FMAs onto a (DUP, bl) accumulator, reading L row-slices."""

    def kernel(l_ref, g_ref, out_ref):
        def body(i, _):
            acc = out_ref[:, :]
            for j in range(DUP):
                acc = acc + l_ref[:, j, :] * g_ref[0][j:j + 1, :]
            out_ref[:, :] = acc
            return 0

        out_ref[:, :] = jnp.zeros((DUP, bl), jnp.float32)
        jax.lax.fori_loop(0, n_loop, body, 0)

    @jax.jit
    def run(l0, g):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DUP, bl), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(l0, g)
        return jnp.sum(out)

    return run


def main():
    rng = np.random.default_rng(0)
    n_loop = 100000
    for bl in (128,):
        p = jnp.asarray(rng.standard_normal((DUP, DUP, bl)).astype(np.float32))
        k = jnp.asarray(
            0.01 * rng.standard_normal((4, DUP, bl)).astype(np.float32))
        s = jnp.asarray(
            np.abs(rng.standard_normal((8, bl))).astype(np.float32))
        g = k
        l0 = p
        bench(f"rank-2 downdate BL={bl}", make_downdate(bl, n_loop),
              k[:2], k[2:], p, passes=n_loop,
              per_pass_elems=2 * DUP * DUP * bl)
        for nt in (1, 2, 4, 7):
            bench(f"joseph terms={nt} BL={bl}",
                  make_joseph_n(bl, nt, n_loop), k, s, p, passes=n_loop,
                  per_pass_elems=DUP * DUP * bl)
        bench(f"matvec axis=1 (sublane) BL={bl}",
              make_matvec_axis(bl, 1, n_loop), l0, g, passes=n_loop,
              per_pass_elems=DUP * DUP * bl)
        bench(f"matvec axis=0 (untiled) BL={bl}",
              make_matvec_axis(bl, 0, n_loop), l0, g, passes=n_loop,
              per_pass_elems=DUP * DUP * bl)
        bench(f"matvec unrolled rank-1 BL={bl}",
              make_matvec_unrolled(bl, n_loop), l0, g, passes=n_loop,
              per_pass_elems=DUP * DUP * bl)
    bl = 256
    p = jnp.asarray(rng.standard_normal((DUP, DUP, bl)).astype(np.float32))
    k = jnp.asarray(0.01 * rng.standard_normal((4, DUP, bl)).astype(np.float32))
    bench(f"rank-2 downdate BL={bl}", make_downdate(bl, n_loop),
          k[:2], k[2:], p, passes=n_loop, per_pass_elems=2 * DUP * DUP * bl)


if __name__ == "__main__":
    main()
