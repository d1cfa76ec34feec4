"""Microbenchmark: speed-of-light attribution for the fused UKF kernel.

Mirrors scripts/micro_downdate.py (the EKF analysis): time each dominant
per-tick op of ops/fused_ukf.py standalone at peak, then compare the summed
prediction against the production kernel's measured per-tick time to decide
whether the UKF throughput (550 steps/s/world shared / 311 per-world-unique,
round 3) is a ceiling or a kernel gap.

Per-tick op inventory for the SLAM kernel (Du=44 -> DUP=48, BL=128):
1. pivot-loop Cholesky of (DUP, DUP, BL)   — predict, every tick
   (a) production spelling: full-width trailing update per pivot
   (b) trailing-columns-only spelling (sublane-aligned) — candidate halving
2. matvec_l: sum_j L[:, j, :] * g[j, :]    — 4x predict cross rows +
   2x per landmark update (cross_col)
3. one-pass symmetric Joseph P update      — per landmark update
4. z-stats block: sigma range/bearing (sqrt + atan2 + wrap over (DUP, BL)
   halves), weighted means, S entries      — per landmark update
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from live_ekf_slam_tpu.ops.kernel_math import atan2 as _atan2, wrap as _wrap

DUP, BL = 48, 128
DU = 44


def bench(name, fn, *args, passes, reps=3, per_pass_elems=None):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    el = (time.perf_counter() - t0) / reps
    us = el / passes * 1e6
    rate = (per_pass_elems * passes / el / 1e9) if per_pass_elems else 0.0
    print(f"{name:36s} {us:8.2f} us/pass   {rate:9.2f} G elem-op/s")
    return us


# ---------------------------------------------------------------- cholesky
def make_chol(variant: str, n_fact: int):
    """variant: 'full' = production full-width trailing update;
    'trail' = sublane-aligned trailing-columns-only update."""

    def kernel(p_ref, out_ref, l_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (DUP, BL), 0)

        def body(i, _):
            l_ref[:, :, :] = p_ref[:, :, :]
            for j in range(DU):
                pivot = l_ref[j, j:j + 1, :]
                ok = (pivot > 1e-8).astype(jnp.float32)
                dval = jnp.sqrt(jnp.maximum(pivot, 1e-8))
                colv = l_ref[:, j, :]
                below = jnp.where(iota > j, colv, 0.0) * (ok / dval)
                if j + 1 < DU:
                    if variant == "full":
                        l_ref[j + 1:, :, :] = (
                            l_ref[j + 1:, :, :]
                            - below[:, None, :][j + 1:] * below[None, :, :]
                        )
                    else:
                        c0 = ((j + 1) // 8) * 8
                        brow = below[c0:, :][None, :, :]   # (1, DUP-c0, BL)
                        bcol = below[:, None, :][j + 1:]   # (DUP-j-1, 1, BL)
                        l_ref[j + 1:, c0:, :] = (
                            l_ref[j + 1:, c0:, :] - bcol * brow
                        )
                colfinal = below + jnp.where(iota == j, 1.0, 0.0) * dval
                l_ref[:, j:j + 1, :] = colfinal[:, None, :]
            out_ref[0:1, :] = out_ref[0:1, :] + l_ref[DU - 1, DU - 1:DU, :]
            return 0

        out_ref[:, :] = jnp.zeros((8, BL), jnp.float32)
        jax.lax.fori_loop(0, n_fact, body, 0)

    @jax.jit
    def run(p):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, BL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((DUP, DUP, BL), jnp.float32)],
        )(p)
        return jnp.sum(out)

    return run


# ---------------------------------------------------------------- matvec_l
def make_matvec(n_per_pass: int, n_loop: int):
    def kernel(l_ref, g_ref, out_ref):
        def body(i, _):
            acc = out_ref[:, :]
            for r in range(n_per_pass):
                acc = acc + jnp.sum(
                    l_ref[:, :, :] * g_ref[r][None, :, :], axis=1
                )
            out_ref[:, :] = acc
            return 0

        out_ref[:, :] = jnp.zeros((DUP, BL), jnp.float32)
        jax.lax.fori_loop(0, n_loop, body, 0)

    @jax.jit
    def run(l0, g):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DUP, BL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(l0, g)
        return jnp.sum(out)

    return run


# ---------------------------------------------------------------- joseph
def make_joseph(spelling: str, n_loop: int):
    """spelling: 'prod9' = production one-pass 9-outer expression;
    'hoist' = symmetric products built once, scalars applied after."""

    def kernel(k0_ref, k1_ref, cr_ref, cb_ref, s_ref, p_in_ref, p_ref):
        del p_in_ref  # aliased

        def body(i, _):
            k0 = k0_ref[:, :]
            k1 = k1_ref[:, :]
            c_r = cr_ref[:, :]
            c_b = cb_ref[:, :]
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
            if spelling == "prod9":
                p_ref[:, :, :] = p_ref[:, :, :] + (
                    -(ko0 * crT + cro * kT0)
                    - (ko1 * cbT + cbo * kT1)
                    + s00 * (ko0 * kT0)
                    + s01 * (ko0 * kT1 + ko1 * kT0)
                    + s11 * (ko1 * kT1)
                )
            else:
                g00 = ko0 * kT0
                g11 = ko1 * kT1
                g01 = ko0 * kT1 + ko1 * kT0
                p_ref[:, :, :] = p_ref[:, :, :] + (
                    s00 * g00 + s01 * g01 + s11 * g11
                    - (ko0 * crT + cro * kT0)
                    - (ko1 * cbT + cbo * kT1)
                )
            return 0

        jax.lax.fori_loop(0, n_loop, body, 0)

    @jax.jit
    def run(k0, k1, cr, cb, s, p):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((DUP, DUP, BL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={5: 0},
        )(k0, k1, cr, cb, s, p)
        return jnp.sum(out)

    return run


# ---------------------------------------------------------------- z-stats
def make_zstats(n_loop: int):
    """The per-landmark sigma measurement block: range+bearing for both
    sigma halves, weighted means, deviations, S entries."""

    def kernel(sp_ref, sm_ref, lm_ref, wm_ref, out_ref):
        def body(i, _):
            lmx = lm_ref[0:1, :]
            lmy = lm_ref[1:2, :]
            wm = wm_ref[:, :]

            def z_of(sx, sy, syaw):
                ddx = lmx - sx
                ddy = lmy - sy
                r = jnp.sqrt(ddx * ddx + ddy * ddy)
                b = _wrap(_atan2(ddy, ddx) - syaw)
                return r, b

            r_p, b_p = z_of(sp_ref[0, :, :], sp_ref[1, :, :], sp_ref[2, :, :])
            r_m, b_m = z_of(sm_ref[0, :, :], sm_ref[1, :, :], sm_ref[2, :, :])
            z_r = jnp.sum(wm * (r_p + r_m), axis=0, keepdims=True)
            sb = jnp.sum(wm * (jnp.sin(b_p) + jnp.sin(b_m)), axis=0,
                         keepdims=True)
            cb = jnp.sum(wm * (jnp.cos(b_p) + jnp.cos(b_m)), axis=0,
                         keepdims=True)
            z_b = _atan2(sb, cb)
            dr_p, dr_m = r_p - z_r, r_m - z_r
            db_p = _wrap(b_p - z_b)
            db_m = _wrap(b_m - z_b)
            s00 = jnp.sum(wm * (dr_p * dr_p + dr_m * dr_m), axis=0,
                          keepdims=True)
            s01 = jnp.sum(wm * (dr_p * db_p + dr_m * db_m), axis=0,
                          keepdims=True)
            s11 = jnp.sum(wm * (db_p * db_p + db_m * db_m), axis=0,
                          keepdims=True)
            out_ref[0:1, :] = out_ref[0:1, :] + s00 + s01 + s11
            return 0

        out_ref[:, :] = jnp.zeros((8, BL), jnp.float32)
        jax.lax.fori_loop(0, n_loop, body, 0)

    @jax.jit
    def run(sp_, sm_, lm_, wm_):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, BL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(sp_, sm_, lm_, wm_)
        return jnp.sum(out)

    return run


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((DUP, DUP, BL)).astype(np.float32)
    p = jnp.asarray(
        np.einsum("ijb,kjb->ikb", a, a) / DUP
        + np.eye(DUP)[:, :, None].astype(np.float32)
    )
    l0 = jnp.asarray(rng.standard_normal((DUP, DUP, BL)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((4, DUP, BL)).astype(np.float32))
    k0 = jnp.asarray(0.1 * rng.standard_normal((DUP, BL)).astype(np.float32))
    k1 = jnp.asarray(0.1 * rng.standard_normal((DUP, BL)).astype(np.float32))
    cr = jnp.asarray(rng.standard_normal((DUP, BL)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((DUP, BL)).astype(np.float32))
    s = jnp.abs(jnp.asarray(rng.standard_normal((8, BL)).astype(np.float32)))
    sp = jnp.asarray(rng.standard_normal((3, DUP, BL)).astype(np.float32))
    wmw = jnp.abs(jnp.asarray(
        rng.standard_normal((DUP, BL)).astype(np.float32)))
    lm = jnp.asarray(rng.standard_normal((8, BL)).astype(np.float32))

    n_fact = 4000
    chol_full_elems = sum((DU - j - 1) * DUP * BL for j in range(DU))
    chol_trail_elems = sum(
        (DU - j - 1) * (DUP - ((j + 1) // 8) * 8) * BL for j in range(DU)
    )
    bench("chol full-width (production)", make_chol("full", n_fact), p,
          passes=n_fact, per_pass_elems=chol_full_elems)
    bench("chol trailing-cols (aligned)", make_chol("trail", n_fact), p,
          passes=n_fact, per_pass_elems=chol_trail_elems)

    n_loop = 50000
    bench("matvec_l (L @ g)", make_matvec(4, n_loop), l0, g,
          passes=4 * n_loop, per_pass_elems=DUP * DUP * BL)

    for sp_name in ("prod9", "hoist"):
        bench(f"joseph one-pass [{sp_name}]",
              make_joseph(sp_name, n_loop), k0, k1, cr, cb, s, p,
              passes=n_loop, per_pass_elems=DUP * DUP * BL)

    bench("z-stats block (per landmark)", make_zstats(n_loop), sp, sp, lm,
          wmw, passes=n_loop, per_pass_elems=2 * 3 * DUP * BL)


if __name__ == "__main__":
    main()
