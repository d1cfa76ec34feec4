"""Fused sim+EKF-SLAM rollout as a single Pallas TPU kernel.

This is the speed-of-light path for the headline benchmark. The XLA
vmap(scan(step)) path (eval/runner.py) streams the full (B, D, D) covariance
through HBM on every one of the ~20 sequential measurement-slot updates per
tick; at 4096 worlds that is ~GBs of HBM traffic per simulated tick. Here the
whole rollout runs inside one kernel with a **lane-major** layout — worlds on
the 128-wide lane dimension, the (D<=48)-dim state on sublanes — so each
world-block's covariance lives in VMEM for all T steps and HBM traffic is just
the command stream in and the final state out.

Key design points (vs the reference algorithms in sim_node.py:209-250 and
ekf.cpp:37-178):

* landmark slot == landmark id. The EKF equations are equivariant under a
  permutation of the state, so pinning each landmark to the slot of its id
  (instead of the reference's discovery order) gives bit-equivalent estimates
  up to reordering — and makes EVERY index in the kernel static: no gathers,
  no dynamic slicing, no one-hot contractions. Requires known landmark ids
  (the default; data association falls back to the XLA path).
* the Kalman gain MUST be formed from true covariance columns (P H^T) while
  the downdate term uses true row combinations (H P): both single-sided
  spellings were tried and diverge in fp32 — (P H^T)^T for HP flips the sign
  of P's antisymmetric rounding residue (A' ~ A + KHA amplification), and
  (H P)^T for the gain destabilizes the same residue dynamics from the other
  side (empirically 100% NaN by T=1000). The mixed form keeps the residue
  contractive, matching the reference's full-matrix recursion.
* masked no-ops by zeroing the Kalman gain: a world whose measurement slot is
  invalid gets K=0, making x += K nu and P -= K(HP) exact identities — no
  select pass over the covariance.
* H is never materialized: its rows have <=5 nonzeros at static indices, so
  P H^T is a 4/5-term combination of static covariance columns, S reads 4/5
  entries of those, and the covariance downdate is a single fused rank-2
  pass — the only O(D^2 * B) work per landmark.
* the predict F P F^T is two rank-1 row updates + two rank-1 column updates
  (F = I + u e2^T with two nonzeros in u): O(D * B), not O(D^2 * B).
* uniform sim noise U(-V, V) (sim_node.py:216-217,246-249) from the on-core
  PRNG (pltpu.prng_random_bits); same distribution family as the reference,
  independent stream.
* angle wrap = theta - 2pi*rint(theta/2pi), exactly C remainder semantics.

Compat quirks honored: noise V/W swap (via cfg.filter_noise()), stale-landmark
linearization (ekf.cpp:115-129), unwrapped bearing innovation (ekf.cpp:131).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from live_ekf_slam_tpu.config import Config
from live_ekf_slam_tpu.core.noise import (
    calibrated_meas_vars,
    motion_moments,
    use_calibrated,
)
from live_ekf_slam_tpu.ops.kernel_math import (
    atan2 as _atan2,
    round_up as _round_up,
    uniform_pm1 as _uniform_pm1,
    wrap as _wrap,
)

# Initial pose covariance diag (ekf.cpp:11-18).
_P0 = (0.01 * 0.01, 0.01 * 0.01, 0.005 * 0.005)


def _make_kernel(cfg: Config, n_lm: int, t_chunk: int, dp: int, bl: int,
                 inject_noise: bool = False, profile_mode: str = "full",
                 predicated: bool = True, emit_traj: bool = False,
                 filter_kind: str = "ekf"):
    """Builds the kernel body, specialized on the static config.

    filter_kind="iekf" swaps the three filter-math sections (predict / update
    / insertion) for the right-invariant EKF's (models/iekf.py equations;
    docs/FILTERS.md derivation), keeping the whole sim + layout scaffold:
      * predict: F = I, so P gains only var_d on a 2x2 block plus ONE full
        rank-1 pass var_th * g_a g_a^T (the yaw-noise column couples into
        every translation slot);
      * update: constant H = [-I | 0 | +I] — P H^T / H P are 2-column /
        2-row differences with NO per-slot trig or divisions; the Cartesian
        innovation and Rtil need only row-level cos/sin of (theta, b); the
        state correction is the exp retraction (rotate all translation
        pairs);
      * insertion: new covariance rows COPY the vehicle-position rows and
        the corner adds Rtil — no heading coupling.
    The EKF compat quirks (stale landmarks, unwrapped innovation) do not
    apply to the invariant filter and are ignored."""
    (v00f, v11f), (w00f, w11f) = cfg.filter_noise()  # filter noise (variances)
    calibrated = use_calibrated(cfg)
    if calibrated:
        # true U(-W, W) measurement variances (core/noise.py); the process
        # moments are per-tick (clip-aware) and computed inside the tick
        w00f, w11f = calibrated_meas_vars(cfg)
    nz = cfg.sim_noise_scale
    v00s = cfg.process_noise.V_00 * nz  # sim noise half-widths (true values)
    v11s = cfg.process_noise.V_11 * nz
    w00s = cfg.sensing_noise.W_00 * nz
    w11s = cfg.sensing_noise.W_11 * nz
    v_d, v_th = cfg.process_noise.v_d, cfg.process_noise.v_th
    w_r, w_b = cfg.sensing_noise.w_r, cfg.sensing_noise.w_b
    d_max = cfg.constraints.commands.d_max
    th_max = cfg.constraints.commands.th_max
    r_max = cfg.constraints.vision.range_max
    fov_min = cfg.constraints.vision.fov_min
    fov_max = cfg.constraints.vision.fov_max
    stale = cfg.compat.ekf_stale_landmarks
    wrap_innov = not cfg.compat.ekf_unwrapped_innovation
    x0, y0, yaw0 = cfg.init_pose

    def kernel(seed_ref, cmds_ref, lms_ref, *rest):
        if inject_noise:
            noise_ref = rest[0]
            rest = rest[1:]
        traj_ref = None
        if emit_traj:
            *rest, traj_ref = rest
        stats_ref, x_ref, p_ref, seen_ref = rest
        blk = pl.program_id(0)
        tc = pl.program_id(1)
        if not inject_noise:
            # distinct PRNG stream per (world-block, time-chunk); with
            # injected noise the PRNG is unused (and unavailable in
            # CPU interpret mode)
            pltpu.prng_seed(seed_ref[0] + blk * 1000003 + tc * 7919)

        # ---- first chunk of each block: init state in the output refs (the
        # out blocks are revisited across time-chunks, staying in VMEM)
        @pl.when(tc == 0)
        def _init():
            x_ref[:, :] = jnp.zeros((dp, bl), jnp.float32)
            x_ref[0:1, :] = jnp.full((1, bl), x0, jnp.float32)
            x_ref[1:2, :] = jnp.full((1, bl), y0, jnp.float32)
            x_ref[2:3, :] = jnp.full((1, bl), yaw0, jnp.float32)
            p_ref[:, :, :] = jnp.zeros((dp, dp, bl), jnp.float32)
            for i, v in enumerate(_P0):
                p_ref[i, i:i + 1, :] = jnp.full((1, bl), v, jnp.float32)
            seen_ref[:, :] = jnp.zeros((n_lm, bl), jnp.float32)
            # stats rows: 0 err_sum, 1 tx, 2 ty, 3 tth
            stats_ref[:, :] = jnp.zeros((8, bl), jnp.float32)
            stats_ref[1:2, :] = jnp.full((1, bl), x0, jnp.float32)
            stats_ref[2:3, :] = jnp.full((1, bl), y0, jnp.float32)
            stats_ref[3:4, :] = jnp.full((1, bl), yaw0, jnp.float32)

        lx = lms_ref[:, 0, :]  # (N, BL) true landmark x
        ly = lms_ref[:, 1, :]

        def tick(t, _):
            cmd = cmds_ref[t]  # (2, BL): fwd, ang
            fwd = cmd[0:1, :]
            ang = cmd[1:2, :]

            if inject_noise:
                u = noise_ref[t]
            else:
                bits = pltpu.prng_random_bits((2 * n_lm + 8, bl))
                u = _uniform_pm1(bits)

            # ---- truth propagation (sim_node.py:216-222)
            tx = stats_ref[1:2, :]
            ty = stats_ref[2:3, :]
            tth = stats_ref[3:4, :]
            d_n = jnp.clip(fwd + v00s * u[0:1, :], 0.0, d_max)
            h_n = jnp.clip(ang + v11s * u[1:2, :], -th_max, th_max)
            tx = tx + d_n * jnp.cos(tth)
            ty = ty + d_n * jnp.sin(tth)
            tth = tth + h_n  # deliberately unwrapped
            stats_ref[1:2, :] = tx
            stats_ref[2:3, :] = ty
            stats_ref[3:4, :] = tth

            # ---- sensing (sim_node.py:228-250), all landmarks at once
            dxl = lx - tx
            dyl = ly - ty
            r_true = jnp.sqrt(dxl * dxl + dyl * dyl)
            beta = _wrap(_atan2(dyl, dxl) - tth)
            vis = (
                (r_true <= r_max) & (beta > fov_min) & (beta < fov_max)
            ).astype(jnp.float32)  # (N, BL)
            rn_all = r_true + w00s * u[2: 2 + n_lm, :]
            bn_all = beta + w11s * u[2 + n_lm: 2 + 2 * n_lm, :]

            # ---- EKF predict (ekf.cpp:41-61) via rank-1 structure
            if profile_mode == "sim":
                ex = x_ref[0:1, :] - stats_ref[1:2, :]
                ey = x_ref[1:2, :] - stats_ref[2:3, :]
                e = jnp.sqrt(ex * ex + ey * ey)
                stats_ref[0:1, :] = stats_ref[0:1, :] + e
                stats_ref[4:5, :] = jnp.maximum(stats_ref[4:5, :], e)
                return 0
            th = x_ref[2:3, :]
            c = jnp.cos(th)
            s = jnp.sin(th)
            if calibrated:
                # clip-aware expected executed command + true clipped
                # variances, per tick on (1, BL) lanes (core/noise.py)
                eff_d, eff_th, var_d, var_th = motion_moments(cfg, fwd, ang)
                jac_d = eff_d
            else:
                eff_d, eff_th = fwd + v_d, ang + v_th
                var_d, var_th = v00f, v11f
                jac_d = fwd  # F_x from the raw command (ekf.cpp:47-50)
            if filter_kind == "iekf":
                # invariant predict: F = I; the distance-noise column is
                # (c, s, 0, ...) — a 2x2 block — and the yaw-noise column
                # g_a = Ad_Xhat(1, (0, -d)) couples into every ACTIVE
                # translation slot: one full rank-1 pass over P
                # conservative Mosaic spelling: contiguous (1, BL) row
                # slices + one sublane concatenate (no strided ref reads, no
                # stack/reshape interleaves — neither has lowering precedent
                # in this codebase)
                xval = x_ref[:, :]
                xv0 = xval[0:1, :]
                xv1 = xval[1:2, :]
                seen_now_p = seen_ref[:, :]  # (N, BL) active-slot mask
                pieces = [
                    jac_d * s + xv1,
                    -jac_d * c - xv0,
                    jnp.ones((1, bl), jnp.float32),
                ]
                for jj in range(n_lm):
                    sj = seen_now_p[jj:jj + 1, :]
                    pieces.append(sj * xval[4 + 2 * jj:5 + 2 * jj, :])
                    pieces.append(-sj * xval[3 + 2 * jj:4 + 2 * jj, :])
                if dp > 3 + 2 * n_lm:
                    pieces.append(
                        jnp.zeros((dp - 3 - 2 * n_lm, bl), jnp.float32)
                    )
                g_a = jnp.concatenate(pieces, axis=0)  # (DP, BL)
                p_ref[:, :, :] = p_ref[:, :, :] + (
                    var_th * g_a[:, None, :] * g_a[None, :, :]
                )
                p_ref[0, 0:1, :] = p_ref[0, 0:1, :] + c * c * var_d
                p_ref[0, 1:2, :] = p_ref[0, 1:2, :] + s * c * var_d
                p_ref[1, 0:1, :] = p_ref[1, 0:1, :] + s * c * var_d
                p_ref[1, 1:2, :] = p_ref[1, 1:2, :] + s * s * var_d
            else:
                u0 = -jac_d * s  # F_x(0,2)
                u1 = jac_d * c   # F_x(1,2)
                row2 = p_ref[2, :, :]  # (DP, BL)
                p_ref[0, :, :] = p_ref[0, :, :] + u0 * row2
                p_ref[1, :, :] = p_ref[1, :, :] + u1 * row2
                col2 = p_ref[:, 2:3, :]  # (DP, 1, BL) — updated rows included
                p_ref[:, 0:1, :] = p_ref[:, 0:1, :] + col2 * u0[None]
                p_ref[:, 1:2, :] = p_ref[:, 1:2, :] + col2 * u1[None]
                # F_v V F_v^T on the top-left 3x3 (ekf.cpp:51-54)
                p_ref[0, 0:1, :] = p_ref[0, 0:1, :] + c * c * var_d
                p_ref[0, 1:2, :] = p_ref[0, 1:2, :] + s * c * var_d
                p_ref[1, 0:1, :] = p_ref[1, 0:1, :] + s * c * var_d
                p_ref[1, 1:2, :] = p_ref[1, 1:2, :] + s * s * var_d
                p_ref[2, 2:3, :] = p_ref[2, 2:3, :] + var_th

            x_ref[0:1, :] = x_ref[0:1, :] + eff_d * c
            x_ref[1:2, :] = x_ref[1:2, :] + eff_d * s
            x_ref[2:3, :] = _wrap(th + eff_th)

            if stale:
                x_committed = x_ref[:, :]  # value snapshot before updates

            # ---- sequential per-landmark update/insertion (ekf.cpp:73-174)
            # profile_mode: "full" | "downdate" (skip scalar algebra) |
            # "nolm" (skip the loop) | "sim" (skip predict+loop) — used to
            # attribute per-tick time between phases.
            n_loop = 0 if profile_mode in ("nolm", "sim") else n_lm
            # gates precomputed for the whole tick: landmark j's seen-state
            # can only change at its own loop iteration, so tick-start `seen`
            # is correct for every j. One vectorized lane-reduction yields all
            # 2N scalar predicates instead of 2N cross-lane reductions.
            seen_now = seen_ref[:, :]
            m_u_all = vis * seen_now           # update gates (N, BL)
            m_i_all = vis * (1.0 - seen_now)   # insertion gates
            upd_any_vec = jnp.max(m_u_all, axis=1, keepdims=True)  # (N, 1)
            ins_any_vec = jnp.max(m_i_all, axis=1, keepdims=True)
            for j in range(n_loop):
                li = 3 + 2 * j
                visj = vis[j:j + 1, :]
                m_u = m_u_all[j:j + 1, :]
                m_i = m_i_all[j:j + 1, :]
                rn = rn_all[j:j + 1, :]
                bn = bn_all[j:j + 1, :]

                # ------- landmark update (ekf.cpp:110-140), executed only
                # when some world in the block updates this landmark (the
                # scalar predicate costs one lane-reduction; with block-
                # correlated visibility it skips most of the O(D^2) work)
                upd_any = (upd_any_vec[j, 0] > 0.0) if predicated else True

                def _update_iekf():
                    """Invariant update (models/iekf.py): constant
                    H = [-I | 0 | +I], Cartesian innovation, exp
                    retraction. No per-slot trig or divisions beyond the
                    row-level cos/sin and the 2x2 S inverse."""
                    xv = x_ref[0:1, :]
                    yv = x_ref[1:2, :]
                    thv = x_ref[2:3, :]
                    lmx = x_ref[li:li + 1, :]
                    lmy = x_ref[li + 1:li + 2, :]
                    cth = jnp.cos(thv)
                    sth = jnp.sin(thv)
                    cbn = jnp.cos(bn)
                    sbn = jnp.sin(bn)
                    c1 = cth * cbn - sth * sbn   # cos(th + b)
                    s1 = sth * cbn + cth * sbn   # sin(th + b)
                    yw0 = rn * c1
                    yw1 = rn * s1
                    # Rtil = Rhat Jpc W Jpc^T Rhat^T via the unit (c1, s1)
                    rr2 = rn * rn
                    rt00 = w00f * c1 * c1 + w11f * rr2 * s1 * s1
                    rt01 = (w00f - w11f * rr2) * c1 * s1
                    rt11 = w00f * s1 * s1 + w11f * rr2 * c1 * c1

                    c0 = p_ref[:, 0, :]
                    cv1 = p_ref[:, 1, :]
                    cl0 = p_ref[:, li, :]
                    cl1 = p_ref[:, li + 1, :]
                    pr = cl0 - c0   # P H^T column 0 (DP, BL)
                    pb = cl1 - cv1  # P H^T column 1
                    s00 = pr[li:li + 1] - pr[0:1] + rt00
                    s01 = pb[li:li + 1] - pb[0:1] + rt01
                    s10 = pr[li + 1:li + 2] - pr[1:2] + rt01
                    s11 = pb[li + 1:li + 2] - pb[1:2] + rt11
                    det = s00 * s11 - s01 * s10
                    det = jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
                    i00 = s11 / det
                    i01 = -s01 / det
                    i10 = -s10 / det
                    i11 = s00 / det
                    k0 = (pr * i00 + pb * i10) * m_u
                    k1 = (pr * i01 + pb * i11) * m_u

                    nu0 = yw0 - (lmx - xv)
                    nu1 = yw1 - (lmy - yv)
                    xi = k0 * nu0 + k1 * nu1  # (DP, BL)

                    # exp retraction (models/iekf._retract): rotate every
                    # translation pair by R(dth) and add V(dth) xi; masked
                    # worlds have xi = 0 -> bitwise identity
                    dth = xi[2:3]
                    cd = jnp.cos(dth)
                    sd = jnp.sin(dth)
                    small = jnp.abs(dth) < 1e-6
                    dsafe = jnp.where(small, 1.0, dth)
                    va = jnp.where(small, 1.0 - dth * dth / 6.0, sd / dsafe)
                    vb = jnp.where(small, 0.5 * dth, (1.0 - cd) / dsafe)
                    nvx = va * xi[0:1] - vb * xi[1:2] + cd * xv - sd * yv
                    nvy = vb * xi[0:1] + va * xi[1:2] + sd * xv + cd * yv
                    xval = x_ref[:, :]
                    x_ref[0:1, :] = nvx
                    x_ref[1:2, :] = nvy
                    x_ref[2:3, :] = _wrap(thv + dth)
                    # per-pair rotation writes: contiguous (1, BL) row ops
                    # only (see the predict branch's Mosaic-spelling note)
                    for jj in range(n_lm):
                        a0 = 3 + 2 * jj
                        lxj = xval[a0:a0 + 1, :]
                        lyj = xval[a0 + 1:a0 + 2, :]
                        kxj = xi[a0:a0 + 1]
                        kyj = xi[a0 + 1:a0 + 2]
                        x_ref[a0:a0 + 1, :] = (
                            va * kxj - vb * kyj + cd * lxj - sd * lyj
                        )
                        x_ref[a0 + 1:a0 + 2, :] = (
                            vb * kxj + va * kyj + sd * lxj + cd * lyj
                        )

                    # P -= K (H P); H P honestly from P ROWS (same mixed
                    # column/row discipline as the EKF kernel's fp32 note)
                    r0 = p_ref[0, :, :]
                    r1 = p_ref[1, :, :]
                    rl0 = p_ref[li, :, :]
                    rl1 = p_ref[li + 1, :, :]
                    hp0 = rl0 - r0
                    hp1 = rl1 - r1
                    p_ref[:, :, :] = (
                        p_ref[:, :, :]
                        - k0[:, None, :] * hp0[None, :, :]
                        - k1[:, None, :] * hp1[None, :, :]
                    )

                def _update():
                    xv = x_ref[0:1, :]
                    yv = x_ref[1:2, :]
                    thv = x_ref[2:3, :]
                    if stale:
                        lmx = x_committed[li:li + 1, :]
                        lmy = x_committed[li + 1:li + 2, :]
                    else:
                        lmx = x_ref[li:li + 1, :]
                        lmy = x_ref[li + 1:li + 2, :]
                    ddx = lmx - xv
                    ddy = lmy - yv
                    d2 = ddx * ddx + ddy * ddy
                    d2 = jnp.maximum(d2, 1e-12)
                    dist = jnp.sqrt(d2)
                    a_r = ddx / dist   # h_r coefficient magnitude (x)
                    b_r = ddy / dist
                    a_b = ddy / d2     # h_b coefficients
                    b_b = ddx / d2

                    c0 = p_ref[:, 0, :]
                    c1 = p_ref[:, 1, :]
                    c2 = p_ref[:, 2, :]
                    cl0 = p_ref[:, li, :]
                    cl1 = p_ref[:, li + 1, :]
                    # pr = P h_r^T, pb = P h_b^T (DP, BL)
                    pr = (cl0 - c0) * a_r + (cl1 - c1) * b_r
                    pb = (c0 - cl0) * a_b + (cl1 - c1) * b_b - c2

                    # S = H (P H^T) + W, entries via the 4/5 nonzeros of H
                    s00 = (
                        -a_r * pr[0:1] - b_r * pr[1:2]
                        + a_r * pr[li:li + 1] + b_r * pr[li + 1:li + 2]
                    ) + w00f
                    s01 = (
                        -a_r * pb[0:1] - b_r * pb[1:2]
                        + a_r * pb[li:li + 1] + b_r * pb[li + 1:li + 2]
                    )
                    s10 = (
                        a_b * pr[0:1] - b_b * pr[1:2] - pr[2:3]
                        - a_b * pr[li:li + 1] + b_b * pr[li + 1:li + 2]
                    )
                    s11 = (
                        a_b * pb[0:1] - b_b * pb[1:2] - pb[2:3]
                        - a_b * pb[li:li + 1] + b_b * pb[li + 1:li + 2]
                    ) + w11f
                    det = s00 * s11 - s01 * s10
                    det = jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
                    i00 = s11 / det
                    i01 = -s01 / det
                    i10 = -s10 / det
                    i11 = s00 / det

                    # K = (P H^T) S^{-1}, gated to zero for non-updating worlds
                    k0 = (pr * i00 + pb * i10) * m_u
                    k1 = (pr * i01 + pb * i11) * m_u

                    ang_lm = _wrap(_atan2(ddy, ddx) - thv)
                    nu_r = rn - dist - w_r
                    nu_b = bn - ang_lm - w_b
                    if wrap_innov:
                        nu_b = _wrap(nu_b)

                    x_new = x_ref[:, :] + k0 * nu_r + k1 * nu_b
                    x_ref[:, :] = x_new
                    x_ref[2:3, :] = _wrap(x_new[2:3, :])
                    # P -= K (H P), one fused rank-2 pass (the only O(D^2) op per
                    # landmark). HP must be computed honestly as row combinations:
                    # substituting (P H^T)^T flips the sign of the antisymmetric
                    # rounding residue of P, turning the update's contraction of
                    # that residue (A' ~ (I-KH) A) into exponential amplification
                    # (A' ~ A + KHA) — observed as smooth fp32 divergence over a
                    # few hundred ticks.
                    r0 = p_ref[0, :, :]
                    r1 = p_ref[1, :, :]
                    r2 = p_ref[2, :, :]
                    rl0 = p_ref[li, :, :]
                    rl1 = p_ref[li + 1, :, :]
                    hp0 = (rl0 - r0) * a_r + (rl1 - r1) * b_r  # (DP, BL)
                    hp1 = (r0 - rl0) * a_b + (rl1 - r1) * b_b - r2
                    p_ref[:, :, :] = (
                        p_ref[:, :, :]
                        - k0[:, None, :] * hp0[None, :, :]
                        - k1[:, None, :] * hp1[None, :, :]
                    )

                pl.when(upd_any)(
                    _update_iekf if filter_kind == "iekf" else _update
                )

                # ------- landmark insertion (ekf.cpp:141-173), predicated
                ins_any = (ins_any_vec[j, 0] > 0.0) if predicated else True

                def _insert_iekf():
                    """Invariant insertion: eta_new = eta_p + Rhat n exactly
                    — rows copy the vehicle-position rows, corner adds
                    Rtil (models/iekf.py)."""
                    xv = x_ref[0:1, :]
                    yv = x_ref[1:2, :]
                    thv = x_ref[2:3, :]
                    cth = jnp.cos(thv)
                    sth = jnp.sin(thv)
                    cbn = jnp.cos(bn)
                    sbn = jnp.sin(bn)
                    c1 = cth * cbn - sth * sbn
                    s1 = sth * cbn + cth * sbn
                    sx = xv + rn * c1
                    sy = yv + rn * s1
                    ins = m_i > 0
                    x_ref[li:li + 1, :] = jnp.where(ins, sx,
                                                    x_ref[li:li + 1, :])
                    x_ref[li + 1:li + 2, :] = jnp.where(
                        ins, sy, x_ref[li + 1:li + 2, :]
                    )
                    rr2 = rn * rn
                    rt00 = w00f * c1 * c1 + w11f * rr2 * s1 * s1
                    rt01 = (w00f - w11f * rr2) * c1 * s1
                    rt11 = w00f * s1 * s1 + w11f * rr2 * c1 * c1
                    nr0 = p_ref[0, :, :]
                    nr1 = p_ref[1, :, :]
                    blk00 = p_ref[0, 0:1, :] + rt00
                    blk01 = p_ref[0, 1:2, :] + rt01
                    blk11 = p_ref[1, 1:2, :] + rt11
                    p_ref[li, :, :] = jnp.where(ins, nr0, p_ref[li, :, :])
                    p_ref[li + 1, :, :] = jnp.where(
                        ins, nr1, p_ref[li + 1, :, :]
                    )
                    p_ref[:, li:li + 1, :] = jnp.where(
                        ins[None], nr0[:, None, :], p_ref[:, li:li + 1, :]
                    )
                    p_ref[:, li + 1:li + 2, :] = jnp.where(
                        ins[None], nr1[:, None, :],
                        p_ref[:, li + 1:li + 2, :],
                    )
                    p_ref[li, li:li + 1, :] = jnp.where(
                        ins, blk00, p_ref[li, li:li + 1, :]
                    )
                    p_ref[li, li + 1:li + 2, :] = jnp.where(
                        ins, blk01, p_ref[li, li + 1:li + 2, :]
                    )
                    p_ref[li + 1, li:li + 1, :] = jnp.where(
                        ins, blk01, p_ref[li + 1, li:li + 1, :]
                    )
                    p_ref[li + 1, li + 1:li + 2, :] = jnp.where(
                        ins, blk11, p_ref[li + 1, li + 1:li + 2, :]
                    )

                def _insert():
                    xv = x_ref[0:1, :]
                    yv = x_ref[1:2, :]
                    thv = x_ref[2:3, :]
                    tb = thv + bn
                    ct = jnp.cos(tb)
                    st = jnp.sin(tb)
                    sx = xv + rn * ct
                    sy = yv + rn * st
                    x_ref[li:li + 1, :] = jnp.where(m_i > 0, sx, x_ref[li:li + 1, :])
                    x_ref[li + 1:li + 2, :] = jnp.where(
                        m_i > 0, sy, x_ref[li + 1:li + 2, :]
                    )
                    ga = -rn * st  # G_x(0,2) = G_z(0,1)
                    gb = rn * ct   # G_x(1,2) = G_z(1,1)
                    # new rows = G_x P[0:3, :]
                    nr0 = p_ref[0, :, :] + ga * p_ref[2, :, :]
                    nr1 = p_ref[1, :, :] + gb * p_ref[2, :, :]
                    # new 2x2 block = G_x P33 G_x^T + G_z W G_z^T (uses OLD P cols)
                    p00 = p_ref[0, 0:1, :]
                    p01 = p_ref[0, 1:2, :]
                    p02 = p_ref[0, 2:3, :]
                    p11 = p_ref[1, 1:2, :]
                    p12 = p_ref[1, 2:3, :]
                    p22 = p_ref[2, 2:3, :]
                    blk00 = (
                        p00 + 2.0 * ga * p02 + ga * ga * p22
                        + ct * ct * w00f + ga * ga * w11f
                    )
                    blk01 = (
                        p01 + gb * p02 + ga * p12 + ga * gb * p22
                        + ct * st * w00f + ga * gb * w11f
                    )
                    blk11 = (
                        p11 + 2.0 * gb * p12 + gb * gb * p22
                        + st * st * w00f + gb * gb * w11f
                    )
                    ins = m_i > 0
                    # write rows li, li+1 (masked), then matching columns, then
                    # the 2x2 block
                    p_ref[li, :, :] = jnp.where(ins, nr0, p_ref[li, :, :])
                    p_ref[li + 1, :, :] = jnp.where(ins, nr1, p_ref[li + 1, :, :])
                    p_ref[:, li:li + 1, :] = jnp.where(
                        ins[None], nr0[:, None, :], p_ref[:, li:li + 1, :]
                    )
                    p_ref[:, li + 1:li + 2, :] = jnp.where(
                        ins[None], nr1[:, None, :], p_ref[:, li + 1:li + 2, :]
                    )
                    p_ref[li, li:li + 1, :] = jnp.where(ins, blk00, p_ref[li, li:li + 1, :])
                    p_ref[li, li + 1:li + 2, :] = jnp.where(
                        ins, blk01, p_ref[li, li + 1:li + 2, :]
                    )
                    p_ref[li + 1, li:li + 1, :] = jnp.where(
                        ins, blk01, p_ref[li + 1, li:li + 1, :]
                    )
                    p_ref[li + 1, li + 1:li + 2, :] = jnp.where(
                        ins, blk11, p_ref[li + 1, li + 1:li + 2, :]
                    )

                pl.when(ins_any)(
                    _insert_iekf if filter_kind == "iekf" else _insert
                )
                seen_ref[j:j + 1, :] = jnp.maximum(seen_now[j:j + 1, :], visj)

            # ---- error metric (plotting_node.py:195-218), online; row 4
            # tracks the running per-world max so the host can latch
            # divergence on instantaneous error like the XLA path does
            # (eval/runner.py guard), not on the run mean
            ex = x_ref[0:1, :] - stats_ref[1:2, :]
            ey = x_ref[1:2, :] - stats_ref[2:3, :]
            e = jnp.sqrt(ex * ex + ey * ey)
            stats_ref[0:1, :] = stats_ref[0:1, :] + e
            stats_ref[4:5, :] = jnp.maximum(stats_ref[4:5, :], e)
            if emit_traj:
                # per-tick pose stream (rows: est x,y,th, true x,y,th, pad):
                # feeds the pose-graph streams-assembly path
                # (posegraph.assemble_streams) with the secondary's node seeds
                traj_ref[t, 0:3, :] = x_ref[0:3, :]
                traj_ref[t, 3:6, :] = stats_ref[1:4, :]
                traj_ref[t, 6:8, :] = jnp.zeros((2, bl), jnp.float32)
            return 0

        jax.lax.fori_loop(0, t_chunk, tick, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block_worlds", "interpret", "profile_mode", "t_chunk",
        "emit_traj", "filter_kind",
    ),
)
def fused_ekf_rollout(
    cfg: Config, landmarks, cmds, seed, block_worlds: int = 256,
    interpret: bool = False, noise=None, profile_mode: str = "full",
    t_chunk: int = 125, emit_traj: bool = False, filter_kind: str = "ekf",
):
    """Run the full T-step sim+EKF rollout for a world batch in one kernel.

    landmarks: (B, N, 2) true maps; cmds: (B, T, 2) commanded odometry;
    seed: () int32 PRNG seed. Returns a dict with per-world err_sum, final
    true pose, final filter state (x (B, D), P (B, D, D)), and seen mask.

    Grid = (world blocks, time chunks): the state lives in the revisited
    output blocks (VMEM-resident across chunks) while the command stream is
    pipelined in chunk-sized pieces, so VMEM holds O(P) not O(T).
    """
    if not cfg.constraints.measurements.landmark_id_is_known:
        raise ValueError("fused rollout requires known landmark ids")
    b, n_lm, _ = landmarks.shape
    t_total = cmds.shape[1]
    bl = block_worlds
    if b % bl != 0:
        raise ValueError(f"batch {b} must be a multiple of block_worlds {bl}")
    if t_total % t_chunk != 0:
        # fall back to one chunk for awkward T (compile-time choice)
        t_chunk = t_total
    n_chunks = t_total // t_chunk
    d = 3 + 2 * n_lm
    dp = _round_up(d, 8)

    cmds_t = jnp.transpose(cmds, (1, 2, 0)).astype(jnp.float32)  # (T, 2, B)
    lms_t = jnp.transpose(landmarks, (1, 2, 0)).astype(jnp.float32)  # (N,2,B)
    seed_arr = jnp.asarray([seed], jnp.int32)

    if emit_traj and profile_mode != "full":
        raise ValueError("emit_traj requires profile_mode='full'")
    kernel = _make_kernel(
        cfg, n_lm, t_chunk, dp, bl, filter_kind=filter_kind,
        inject_noise=noise is not None, profile_mode=profile_mode,
        # the section predicates are a pure skip-work optimization (masked
        # gains already make skipped updates exact no-ops); the interpreter
        # mishandles value-dependent pl.when, so run unpredicated there
        predicated=not interpret,
        emit_traj=emit_traj,
    )
    in_specs = [
        pl.BlockSpec((t_chunk, 2, bl), lambda i, tc, *_: (tc, 0, i)),
        pl.BlockSpec((n_lm, 2, bl), lambda i, tc, *_: (0, 0, i)),
    ]
    inputs = [seed_arr, cmds_t, lms_t]
    if noise is not None:
        # (T, 2N+8, B) pre-generated noise in [-1, 1) for replay/debugging
        in_specs.append(
            pl.BlockSpec(
                (t_chunk, 2 * n_lm + 8, bl), lambda i, tc, *_: (tc, 0, i)
            )
        )
        inputs.append(jnp.asarray(noise, jnp.float32))
    out_specs = [
        pl.BlockSpec((8, bl), lambda i, tc, *_: (0, i)),
        pl.BlockSpec((dp, bl), lambda i, tc, *_: (0, i)),
        pl.BlockSpec((dp, dp, bl), lambda i, tc, *_: (0, 0, i)),
        pl.BlockSpec((n_lm, bl), lambda i, tc, *_: (0, i)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8, b), jnp.float32),
        jax.ShapeDtypeStruct((dp, b), jnp.float32),
        jax.ShapeDtypeStruct((dp, dp, b), jnp.float32),
        jax.ShapeDtypeStruct((n_lm, b), jnp.float32),
    ]
    if emit_traj:
        out_specs.append(
            pl.BlockSpec((t_chunk, 8, bl), lambda i, tc, *_: (tc, 0, i))
        )
        out_shape.append(jax.ShapeDtypeStruct((t_total, 8, b), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bl, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    stats, x_out, p_out, seen = outs[:4]

    res = {
        "err_sum": stats[0],
        "err_max": stats[4],
        "true_pose": jnp.transpose(stats[1:4], (1, 0)),
        "x": jnp.transpose(x_out, (1, 0))[:, :d],
        "P": jnp.transpose(p_out, (2, 0, 1))[:, :d, :d],
        "seen": jnp.transpose(seen, (1, 0)) > 0.5,
    }
    if emit_traj:
        # (T, 8, B) -> (B, T, 3) est / true pose streams
        res["est_traj"] = jnp.transpose(outs[4][:, 0:3, :], (2, 0, 1))
        res["true_traj"] = jnp.transpose(outs[4][:, 3:6, :], (2, 0, 1))
    return res


def fused_ekf_rollout_sharded(
    cfg: Config, landmarks, cmds, seed, mesh, block_worlds: int = 256,
    interpret: bool = False, noise=None,
):
    """Multi-chip fused rollout: shard the world batch over a 1-D mesh.

    Each device runs the Pallas kernel on its own shard (worlds are fully
    independent; there is no cross-chip communication inside the rollout —
    reductions over the results ride the mesh afterwards). The PRNG seed is
    decorrelated per device via the mesh axis index.
    """
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    b = landmarks.shape[0]
    if b % n_dev != 0:
        raise ValueError(f"batch {b} not divisible by mesh size {n_dev}")

    out_specs = {
        "err_sum": P(axis),
        "err_max": P(axis),
        "true_pose": P(axis),
        "x": P(axis),
        "P": P(axis),
        "seen": P(axis),
    }
    in_specs = [P(axis), P(axis, None)]
    args = [landmarks, cmds]
    if noise is not None:
        in_specs.append(P(None, None, axis))
        args.append(noise)

    @_ft.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        # pallas_call's ShapeDtypeStruct outputs carry no varying-mesh-axis
        # info; the per-device kernels are fully independent
        check_vma=False,
    )
    def run(lms_shard, cmds_shard, *rest):
        dev = jax.lax.axis_index(axis)
        local_noise = rest[0] if rest else None
        return fused_ekf_rollout(
            cfg,
            lms_shard,
            cmds_shard,
            seed + dev * jnp.int32(1000003),
            block_worlds=block_worlds,
            interpret=interpret,
            noise=local_noise,
        )

    return run(*args)


def fused_iekf_rollout(cfg: Config, landmarks, cmds, seed, **kw):
    """Fused sim + right-invariant-EKF-SLAM rollout (models/iekf.py math in
    the same lane-major single-kernel scaffold; see _make_kernel's
    filter_kind notes). Same signature/returns as fused_ekf_rollout."""
    return fused_ekf_rollout(
        cfg, landmarks, cmds, seed, filter_kind="iekf", **kw
    )
