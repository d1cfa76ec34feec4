"""Fused sim+UKF rollout (SLAM & localization) as a single Pallas TPU kernel.

The XLA UKF path (models/ukf.py) pays a per-tick batched eigendecomposition
(the reference's nearestSPD + matrix sqrt, ukf.cpp:106-123) plus HBM streaming
of the (B, Du, Du) covariance — ~35 steps/s/world at 256 worlds. This kernel
keeps everything VMEM-resident like the EKF kernel (ops/fused_rollout.py) and
restructures the unscented transform around what the hardware can do:

* **Cholesky sigma points** (UKFConfig.sigma_sqrt="chol"): any S with
  S S^T = P gives a valid unscented transform (identical propagated mean and
  covariance to the quadrature's order); a pivot-clamped Cholesky is
  O(Du^3/3) of pure FMA with no eigensolver, and the measurement update uses
  the **Joseph form** (P - KC^T - CK^T + KSK^T), which is PSD for any gain —
  so the clamp only ever sees fp-noise-level negatives, where zeroing the
  column is benign (PSD Schur: tiny pivot implies tiny column). The XLA path
  implements the identical factorization and update (models/ukf.py:
  chol_clamped + Joseph under sigma_sqrt="chol") as the parity oracle; the
  reference's exact eigen-sqrt + simple update remain there as the default.
* **Only the 4 vehicle rows propagate.** The motion model (ukf.cpp:125-135)
  touches (x, y, cos th, sin th) only, so sigma columns keep their +/-L[lm,:]
  landmark offsets: P_pred's landmark-landmark block equals the (clamped)
  prior block exactly and is left in place, the vehicle-landmark cross block
  is L @ g (one matvec pass per vehicle row), and only the 4x4 vehicle block
  needs explicit weighted sums. O(Du^2) per tick instead of O(Du^2 (2Du+1)).
* **Sigma columns are never materialized** as a (Du, 2Du+1) array: the +half
  and -half live as row vectors (columns on sublanes), and every weighted
  sigma sum splits into a center term, a delta term, and an L-matvec.
* The per-landmark update (ukf.cpp:293-349) computes the 2x2 innovation
  covariance and the (Du, 2) cross-covariance the same way: C = delta * sw +
  L @ g per z-component (two matvec passes), then a masked-gain rank-2
  downdate identical in structure to the EKF kernel's.
* Landmark slot == landmark id (known-id mode), masked no-ops via zeroed
  gains, updates-before-insertions (ukf.cpp:251-287), fresh W block with zero
  cross-covariance on insertion (ukf.cpp:363-368).

Shortcuts vs the XLA oracle (both O(eps)-level when P stays PD, documented
for the parity tests): x_pred's landmark rows are the prior rows exactly
(the oracle's +/-L contributions cancel pairwise), and P_pred's
landmark-landmark block skips the clamp correction (exact whenever no active
pivot clamps, i.e. always in default mode).

Compat quirks honored: noise V/W swap (cfg.filter_noise()), zero bearing
mean (ukf.cpp:310-314), committed-yaw sensing (ukf.cpp:139).
"""

from __future__ import annotations

import functools
import math

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

# Initial covariance diag (ukf.cpp:9-18).
_P0_DIAG = (0.01 * 0.01, 0.01 * 0.01, 0.005 * 0.005, 0.005 * 0.005)
_CHOL_EPS = 1e-8


def _make_kernel(cfg: Config, n_lm: int, t_chunk: int, du: int, dup: int,
                 bl: int, slam: bool, inject_noise: bool, predicated: bool):
    (v00f, v11f), (w00f, w11f) = cfg.filter_noise()
    calibrated = use_calibrated(cfg)
    if calibrated:
        w00f, w11f = calibrated_meas_vars(cfg)
    # scale-aware determinant floor for the update sanity gate (see
    # models/ukf.py): calibrated R is ~300x smaller in variance
    det_gate = min(1e-12, 1e-6 * w00f * w11f)
    nz = cfg.sim_noise_scale
    v00s = cfg.process_noise.V_00 * nz
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
    w0 = cfg.ukf.W_0
    zero_b_mean = cfg.compat.ukf_zero_bearing_mean
    committed_yaw = cfg.compat.ukf_committed_yaw_in_sensing
    signed_q = cfg.compat.ukf_signed_process_noise
    x0, y0, yaw0 = cfg.init_pose

    def kernel(seed_ref, cmds_ref, lms_ref, *rest):
        if inject_noise:
            noise_ref = rest[0]
            rest = rest[1:]
        (stats_ref, x_ref, p_ref, seen_ref, l_ref, sigp_ref, sigm_ref) = rest
        blk = pl.program_id(0)
        tc = pl.program_id(1)
        if not inject_noise:
            pltpu.prng_seed(seed_ref[0] + blk * 1000003 + tc * 7919)

        iota = jax.lax.broadcasted_iota(jnp.int32, (dup, bl), 0)

        def matvec_l(l_ref_, g):
            """sum_j L[:, j, :] * g[j, :] -> (dup, bl). The single full
            product is ~16% faster than 8-sublane-chunk accumulation (and
            chunking did not shrink scoped VMEM enough for block 256
            anyway, so block_worlds stays 128)."""
            return jnp.sum(l_ref_[:, :, :] * g[None, :, :], axis=1)

        @pl.when(tc == 0)
        def _init():
            x_ref[:, :] = jnp.zeros((dup, bl), jnp.float32)
            x_ref[0:1, :] = jnp.full((1, bl), x0, jnp.float32)
            x_ref[1:2, :] = jnp.full((1, bl), y0, jnp.float32)
            x_ref[2:3, :] = jnp.full((1, bl), math.cos(yaw0), jnp.float32)
            x_ref[3:4, :] = jnp.full((1, bl), math.sin(yaw0), jnp.float32)
            p_ref[:, :, :] = jnp.zeros((dup, dup, bl), jnp.float32)
            for i, v in enumerate(_P0_DIAG):
                p_ref[i, i:i + 1, :] = jnp.full((1, bl), v, jnp.float32)
            seen_ref[:, :] = jnp.zeros((n_lm, bl), jnp.float32)
            stats_ref[:, :] = jnp.zeros((8, bl), jnp.float32)
            stats_ref[1:2, :] = jnp.full((1, bl), x0, jnp.float32)
            stats_ref[2:3, :] = jnp.full((1, bl), y0, jnp.float32)
            stats_ref[3:4, :] = jnp.full((1, bl), yaw0, jnp.float32)

        lx = lms_ref[:, 0, :]  # (N, BL) true landmark x
        ly = lms_ref[:, 1, :]

        def tick(t, _):
            cmd = cmds_ref[t]
            fwd = cmd[0:1, :]
            ang = cmd[1:2, :]

            if inject_noise:
                u = noise_ref[t]
            else:
                bits = pltpu.prng_random_bits((2 * n_lm + 8, bl))
                u = _uniform_pm1(bits)

            # ---- truth propagation + sensing (sim_node.py:209-250), same as
            # the EKF kernel
            tx = stats_ref[1:2, :]
            ty = stats_ref[2:3, :]
            tth = stats_ref[3:4, :]
            d_n = jnp.clip(fwd + v00s * u[0:1, :], 0.0, d_max)
            h_n = jnp.clip(ang + v11s * u[1:2, :], -th_max, th_max)
            tx = tx + d_n * jnp.cos(tth)
            ty = ty + d_n * jnp.sin(tth)
            tth = tth + h_n
            stats_ref[1:2, :] = tx
            stats_ref[2:3, :] = ty
            stats_ref[3:4, :] = tth

            dxl = lx - tx
            dyl = ly - ty
            r_true = jnp.sqrt(dxl * dxl + dyl * dyl)
            beta = _wrap(_atan2(dyl, dxl) - tth)
            vis = (
                (r_true <= r_max) & (beta > fov_min) & (beta < fov_max)
            ).astype(jnp.float32)
            rn_all = r_true + w00s * u[2: 2 + n_lm, :]
            bn_all = beta + w11s * u[2 + n_lm: 2 + 2 * n_lm, :]

            # ---- UKF predict (ukf.cpp:197-241)
            xc = x_ref[2:3, :]
            xs = x_ref[3:4, :]
            # committed-yaw direction (ukf.cpp:181): the state stores
            # (cos th, sin th), so cos/sin of the committed yaw are the
            # normalized components — no atan2+cos+sin round trip. (The
            # means m2/m3 are weighted sums, hence not unit-norm.)
            nrm_c = xc * xc + xs * xs
            inv_c = jnp.where(nrm_c > 0.0, jax.lax.rsqrt(nrm_c), 0.0)
            cyawv = jnp.where(nrm_c > 0.0, xc * inv_c, 1.0)
            syawv = xs * inv_c
            if slam:
                n_act = 4.0 + 2.0 * jnp.sum(seen_ref[:, :], axis=0,
                                            keepdims=True)  # (1, BL)
            else:
                n_act = jnp.full((1, bl), 4.0, jnp.float32)
            scale = n_act / jnp.float32(1.0 - w0)
            wbar = jnp.float32(1.0 - w0) / (2.0 * n_act)
            # active sigma-column mask (models/ukf.py:_weights). With slot=id
            # the active dimensions are NOT a prefix: dim 4+2j/5+2j is active
            # iff landmark j has been inserted, so the mask is built from the
            # seen flags, not an index threshold.
            colmask = (iota < 4).astype(jnp.float32)
            if slam:
                for j in range(n_lm):
                    dimj = (iota == 4 + 2 * j) | (iota == 5 + 2 * j)
                    colmask = colmask + jnp.where(
                        dimj, seen_ref[j:j + 1, :], 0.0
                    )
            wm = wbar * colmask  # (DUP, BL) weight of column pair j

            # pivot-clamped Cholesky of P*scale, in place in l_ref
            # (models/ukf.py:chol_clamped is the jittable oracle twin).
            # Pivots at or above the block's active-dimension bound are
            # skipped (slam): rows/cols of never-inserted slots are exactly
            # zero by induction, so those pivot steps are exact no-ops
            # whose trailing sweeps are the kernel's single largest cost
            # (micro_ukf.py: 14.2 us of a 57 us block-tick). The factor's
            # inactive columns stay all-zero instead of carrying the
            # clamped 1e-4 diagonal — identical results because every
            # consumer weights those columns by wm = 0.
            if slam:
                seen_any = jnp.max(seen_ref[:, :], axis=1, keepdims=True)
                sl_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (n_lm, 1), 0
                )
                dmax_vec = jnp.max(
                    jnp.where(seen_any > 0.0, sl_iota + 1, 0),
                    axis=0, keepdims=True,
                )  # (1, 1) highest seen slot + 1
                dmax = 4 + 2 * dmax_vec[0, 0]
            l_ref[:, :, :] = p_ref[:, :, :] * scale[None, :, :]
            for j in range(du):

                def _pivot(j=j):
                    pivot = l_ref[j, j:j + 1, :]  # (1, BL)
                    ok = (pivot > _CHOL_EPS).astype(jnp.float32)
                    dval = jnp.sqrt(jnp.maximum(pivot, _CHOL_EPS))
                    colv = l_ref[:, j, :]  # (DUP, BL)
                    below = jnp.where(iota > j, colv, 0.0) * (ok / dval)
                    if j + 1 < du:
                        l_ref[j + 1:, :, :] = (
                            l_ref[j + 1:, :, :]
                            - below[:, None, :][j + 1:] * below[None, :, :]
                        )
                    colfinal = below + jnp.where(iota == j, 1.0, 0.0) * dval
                    l_ref[:, j:j + 1, :] = colfinal[:, None, :]

                if slam and predicated and j >= 4:
                    pl.when(j < dmax)(_pivot)
                else:
                    _pivot()

            # sigma vehicle rows: center and +/- halves (columns on sublanes)
            la0 = l_ref[0, :, :]
            la1 = l_ref[1, :, :]
            la2 = l_ref[2, :, :]
            la3 = l_ref[3, :, :]
            xv0 = x_ref[0:1, :]
            xv1 = x_ref[1:2, :]

            if calibrated:
                # clip-aware executed-motion moments (core/noise.py)
                mv, ath, var_d, var_th = motion_moments(cfg, fwd, ang)
            else:
                mv = fwd + v_d  # commanded forward + noise mean
                ath = ang + v_th
                var_d, var_th = v00f, v11f

            # heading-increment direction: ath is a (1, BL) row, so this is
            # two transcendentals per row, not per sigma element
            ca = jnp.cos(ath)
            sa = jnp.sin(ath)

            def propagate(px, py, pc, ps):
                """Sigma propagation without per-element transcendentals:
                cos/sin(atan2(ps, pc)) is (pc, ps) normalized, and the
                post-increment direction is a rotation by ath — exact
                identities of ukf.cpp:125-137's angle form. The yaw angle
                itself is never needed downstream (sensing consumes the
                direction components)."""
                nrm = pc * pc + ps * ps
                inv = jnp.where(nrm > 0.0, jax.lax.rsqrt(nrm), 0.0)
                cy = jnp.where(nrm > 0.0, pc * inv, 1.0)
                sy = ps * inv
                return (
                    px + mv * cy,
                    py + mv * sy,
                    cy * ca - sy * sa,
                    sy * ca + cy * sa,
                )

            pxn, pyn, pcn, psn = propagate(
                xv0 + la0, xv1 + la1, xc + la2, xs + la3
            )
            mxn, myn, mcn, msn = propagate(
                xv0 - la0, xv1 - la1, xc - la2, xs - la3
            )
            cxn, cyn, ccn, csn = propagate(xv0, xv1, xc, xs)
            sigp_ref[0, :, :] = pxn
            sigp_ref[1, :, :] = pyn
            sigm_ref[0, :, :] = mxn
            sigm_ref[1, :, :] = myn

            # x_pred vehicle rows (landmark rows unchanged: the oracle's
            # +/-L contributions cancel)
            def smean(c, p, m):
                return w0 * c + jnp.sum(wm * (p + m), axis=0, keepdims=True)

            m0 = smean(cxn, pxn, mxn)
            m1 = smean(cyn, pyn, myn)
            m2 = smean(ccn, pcn, mcn)
            m3 = smean(csn, psn, msn)
            x_ref[0:1, :] = m0
            x_ref[1:2, :] = m1
            x_ref[2:3, :] = m2
            x_ref[3:4, :] = m3
            x_pred0 = x_ref[:, :]  # committed predict mean (value snapshot)

            # P_pred: vehicle 4x4 block + vehicle-landmark cross rows/cols;
            # landmark-landmark block stays (see module docstring)
            dps = (pxn - m0, pyn - m1, pcn - m2, psn - m3)
            dms = (mxn - m0, myn - m1, mcn - m2, msn - m3)
            dcs = (cxn - m0, cyn - m1, ccn - m2, csn - m3)
            # process noise (ukf.cpp:182-186): signed-diag reference quirk
            # behind compat (indefinite P; prefer the XLA eigh path for long
            # compat rollouts), correct PSD projection Q = G V G^T otherwise.
            # cyawv/syawv (committed-yaw direction) computed above.
            if signed_q:
                qd = {
                    (0, 0): var_d * cyawv, (1, 1): var_d * syawv,
                    (2, 2): var_th * cyawv, (3, 3): var_th * syawv,
                }
            else:
                qd = {
                    (0, 0): var_d * cyawv * cyawv,
                    (0, 1): var_d * cyawv * syawv,
                    (1, 1): var_d * syawv * syawv,
                    (2, 2): var_th * syawv * syawv,
                    (2, 3): -var_th * cyawv * syawv,
                    (3, 3): var_th * cyawv * cyawv,
                }
            p44 = {}
            for a in range(4):
                for b in range(a, 4):
                    s = w0 * dcs[a] * dcs[b] + jnp.sum(
                        wm * (dps[a] * dps[b] + dms[a] * dms[b]),
                        axis=0, keepdims=True,
                    )
                    if (a, b) in qd:
                        s = s + qd[(a, b)]
                    p44[(a, b)] = s
            rows4 = []
            for a in range(4):
                g_a = wm * (dps[a] - dms[a])  # (DUP, BL)
                cross = matvec_l(l_ref, g_a)  # (DUP, BL) = L @ g_a
                head = jnp.zeros((dup, bl), jnp.float32)
                for b in range(4):
                    v = p44[(min(a, b), max(a, b))]
                    head = head + jnp.where(iota == b, v, 0.0)
                rows4.append(jnp.where(iota < 4, head, cross))
            for a in range(4):
                p_ref[a, :, :] = rows4[a]
            for a in range(4):
                p_ref[:, a:a + 1, :] = rows4[a][:, None, :]

            if slam:
                seen_now = seen_ref[:, :]
                m_u_all = vis * seen_now
                m_i_all = vis * (1.0 - seen_now)
                upd_any_vec = jnp.max(m_u_all, axis=1, keepdims=True)
                ins_any_vec = jnp.max(m_i_all, axis=1, keepdims=True)
            else:
                m_u_all = vis
                upd_any_vec = jnp.max(vis, axis=1, keepdims=True)

            # ---- pass 1: landmark updates (ukf.cpp:293-349)
            for j in range(n_lm):
                m_u = m_u_all[j:j + 1, :]
                rn = rn_all[j:j + 1, :]
                bn = bn_all[j:j + 1, :]
                upd_any = (upd_any_vec[j, 0] > 0.0) if predicated else True

                @pl.when(upd_any)
                def _update():
                    if slam:
                        li = 4 + 2 * j
                        lmx_c = x_pred0[li:li + 1, :]
                        lmy_c = x_pred0[li + 1:li + 2, :]
                        ll0 = l_ref[li, :, :]
                        ll1 = l_ref[li + 1, :, :]
                        lxp, lxm = lmx_c + ll0, lmx_c - ll0
                        lyp, lym = lmy_c + ll1, lmy_c - ll1
                    else:
                        lmx_c = lx[j:j + 1, :]
                        lmy_c = ly[j:j + 1, :]
                        lxp = lxm = jnp.broadcast_to(lmx_c, (dup, bl))
                        lyp = lym = jnp.broadcast_to(lmy_c, (dup, bl))

                    wbc = math.cos(w_b)
                    wbs = math.sin(w_b)

                    def z_of(lmx, lmy, sx, sy, cy, sy2):
                        """Range + bearing DIRECTION (cos b, sin b) for
                        b = atan2(ddy, ddx) - yaw + w_b, via exact rotation
                        algebra on the unit line-of-sight vector instead of
                        atan2+sin+cos per sigma element (the last
                        non-structural cost in the kernel's speed-of-light
                        audit, docs/BENCHMARKS.md). r0 = nrm * rsqrt(nrm)
                        spares a separate sqrt."""
                        ddx = lmx - sx
                        ddy = lmy - sy
                        nrm = ddx * ddx + ddy * ddy
                        inv = jnp.where(nrm > 0.0, jax.lax.rsqrt(nrm), 0.0)
                        ux = ddx * inv
                        uy = ddy * inv
                        cb_ = ux * cy + uy * sy2  # cos(atan2 - yaw)
                        sb_ = uy * cy - ux * sy2
                        if w_b != 0.0:
                            cb_, sb_ = (cb_ * wbc - sb_ * wbs,
                                        sb_ * wbc + cb_ * wbs)
                        return nrm * inv + w_r, cb_, sb_

                    if committed_yaw:
                        dir_p = dir_m = dir_c = (cyawv, syawv)
                    else:
                        dir_p, dir_m, dir_c = (
                            (pcn, psn), (mcn, msn), (ccn, csn)
                        )
                    r_p, cb_p, sb_p = z_of(lxp, lyp, sigp_ref[0, :, :],
                                           sigp_ref[1, :, :], *dir_p)
                    r_m, cb_m, sb_m = z_of(lxm, lym, sigm_ref[0, :, :],
                                           sigm_ref[1, :, :], *dir_m)
                    r_c, cb_c, sb_c = z_of(lmx_c, lmy_c, cxn, cyn, *dir_c)

                    z_r = w0 * r_c + jnp.sum(
                        wm * (r_p + r_m), axis=0, keepdims=True
                    )
                    if zero_b_mean:
                        # reference quirk (ukf.cpp:310-314): bearing mean
                        # stays 0, so deviations are the raw wrapped bearings
                        z_b = jnp.zeros((1, bl), jnp.float32)
                        mcb = jnp.float32(1.0)
                        msb = jnp.float32(0.0)
                    else:
                        msb = w0 * sb_c + jnp.sum(
                            wm * (sb_p + sb_m), axis=0, keepdims=True
                        )
                        mcb = w0 * cb_c + jnp.sum(
                            wm * (cb_p + cb_m), axis=0, keepdims=True
                        )
                        z_b = _atan2(msb, mcb)

                    dr_p, dr_m, dr_c = r_p - z_r, r_m - z_r, r_c - z_r

                    def dev_b(cb_, sb_):
                        # wrap(b - z_b) = atan2(sin(b - z_b), cos(b - z_b));
                        # atan2 is scale-invariant, so the un-normalized
                        # mean direction (mcb, msb) is used directly
                        return _atan2(sb_ * mcb - cb_ * msb,
                                      cb_ * mcb + sb_ * msb)

                    db_p = dev_b(cb_p, sb_p)
                    db_m = dev_b(cb_m, sb_m)
                    db_c = dev_b(cb_c, sb_c)

                    def wsum(ap, am, ac):
                        return w0 * ac + jnp.sum(
                            wm * (ap + am), axis=0, keepdims=True
                        )

                    s00 = wsum(dr_p * dr_p, dr_m * dr_m, dr_c * dr_c) + w00f
                    s01 = wsum(dr_p * db_p, dr_m * db_m, dr_c * db_c)
                    s11 = wsum(db_p * db_p, db_m * db_m, db_c * db_c) + w11f

                    # cross-covariance C = sum_s w dev_x diff^T: landmark rows
                    # via delta + L-matvec, vehicle rows explicit
                    delta = x_pred0 - x_ref[:, :]  # (DUP, BL)
                    dev4 = (
                        sigp_ref[0, :, :] - x_ref[0:1, :],
                        sigp_ref[1, :, :] - x_ref[1:2, :],
                        pcn - x_ref[2:3, :],
                        psn - x_ref[3:4, :],
                    )
                    dev4m = (
                        sigm_ref[0, :, :] - x_ref[0:1, :],
                        sigm_ref[1, :, :] - x_ref[1:2, :],
                        mcn - x_ref[2:3, :],
                        msn - x_ref[3:4, :],
                    )
                    dev4c = (
                        cxn - x_ref[0:1, :],
                        cyn - x_ref[1:2, :],
                        ccn - x_ref[2:3, :],
                        csn - x_ref[3:4, :],
                    )

                    def cross_col(d_p, d_m, d_c):
                        sw = wsum(d_p, d_m, d_c)  # (1, BL)
                        g = wm * (d_p - d_m)
                        c_full = delta * sw + matvec_l(l_ref, g)
                        head = jnp.zeros((dup, bl), jnp.float32)
                        for a in range(4):
                            va = w0 * dev4c[a] * d_c + jnp.sum(
                                wm * (dev4[a] * d_p + dev4m[a] * d_m),
                                axis=0, keepdims=True,
                            )
                            head = head + jnp.where(iota == a, va, 0.0)
                        return jnp.where(iota < 4, head, c_full)

                    c_r = cross_col(dr_p, dr_m, dr_c)
                    c_b = cross_col(db_p, db_m, db_c)

                    det_raw = s00 * s11 - s01 * s01
                    # gate on the RAW determinant (see models/ukf.py)
                    det = jnp.where(jnp.abs(det_raw) > 0, det_raw, 1.0)
                    i00 = s11 / det
                    i01 = -s01 / det
                    i11 = s00 / det

                    nu_r = rn - z_r
                    nu_b = _wrap(bn - z_b)
                    # divergence guard (ukf.cpp:207-211's try/catch role +
                    # SURVEY §5 validity masks): reject inconsistent updates
                    # so a diverged world coasts instead of going NaN
                    sane = (
                        (jnp.abs(nu_r) < 2.0 * r_max)
                        & (det_raw > det_gate)
                        & (s00 > 0.0)
                        & (s11 > 0.0)
                    ).astype(jnp.float32)
                    stats_ref[4:5, :] = stats_ref[4:5, :] + m_u * (1.0 - sane)
                    m_g = m_u * sane

                    k0 = (c_r * i00 + c_b * i01) * m_g
                    k1 = (c_r * i01 + c_b * i11) * m_g
                    x_ref[:, :] = x_ref[:, :] + k0 * nu_r + k1 * nu_b

                    # Joseph form P -= K C^T + C K^T - K S K^T (see
                    # models/ukf.py): PSD for any gain, which keeps the
                    # pivot clamp benign; masked gains still make skipped
                    # worlds exact no-ops (every term carries k).
                    #
                    # ONE pass, symmetric BY FP CONSTRUCTION: each paired
                    # term u_i v_j + v_i u_j is exactly symmetric in IEEE
                    # arithmetic (products and the one addition commute), and
                    # K S K^T expands into such pairs — so P stays exactly
                    # symmetric tick after tick. The previous three-pass
                    # spelling accumulated (i,j)/(j,i) rounding skew over
                    # 1000-tick rollouts, slowly corrupting the Cholesky and
                    # feeding the chol-mode divergence tail; it also swept
                    # VMEM three times per landmark.
                    ko0 = k0[:, None, :]
                    ko1 = k1[:, None, :]
                    cro = c_r[:, None, :]
                    cbo = c_b[:, None, :]
                    kT0 = k0[None, :, :]
                    kT1 = k1[None, :, :]
                    crT = c_r[None, :, :]
                    cbT = c_b[None, :, :]
                    p_ref[:, :, :] = p_ref[:, :, :] + (
                        -(ko0 * crT + cro * kT0)
                        - (ko1 * cbT + cbo * kT1)
                        + s00 * (ko0 * kT0)
                        + s01 * (ko0 * kT1 + ko1 * kT0)
                        + s11 * (ko1 * kT1)
                    )

            # ---- pass 2: insertions (slam only; ukf.cpp:351-372)
            if slam:
                yaw_now = _atan2(x_ref[3:4, :], x_ref[2:3, :])
                for j in range(n_lm):
                    li = 4 + 2 * j
                    m_i = m_i_all[j:j + 1, :]
                    visj = vis[j:j + 1, :]
                    ins_any = (ins_any_vec[j, 0] > 0.0) if predicated else True

                    @pl.when(ins_any)
                    def _insert():
                        rn = rn_all[j:j + 1, :]
                        bn = bn_all[j:j + 1, :]
                        tb = yaw_now + bn
                        sx = x_ref[0:1, :] + rn * jnp.cos(tb)
                        sy = x_ref[1:2, :] + rn * jnp.sin(tb)
                        ins = m_i > 0
                        x_ref[li:li + 1, :] = jnp.where(
                            ins, sx, x_ref[li:li + 1, :]
                        )
                        x_ref[li + 1:li + 2, :] = jnp.where(
                            ins, sy, x_ref[li + 1:li + 2, :]
                        )
                        # fresh W block, zero cross terms (rows/cols of an
                        # uninserted slot are exactly zero by induction)
                        p_ref[li, li:li + 1, :] = jnp.where(
                            ins, jnp.float32(w00f), p_ref[li, li:li + 1, :]
                        )
                        p_ref[li + 1, li + 1:li + 2, :] = jnp.where(
                            ins, jnp.float32(w11f),
                            p_ref[li + 1, li + 1:li + 2, :],
                        )
                    seen_ref[j:j + 1, :] = jnp.maximum(
                        seen_ref[j:j + 1, :], visj
                    )

            # ---- error metric (plotting_node.py:195-218); row 5 tracks the
            # running per-world max so the host can latch divergence on
            # instantaneous error like the XLA path (eval/runner.py guard)
            ex = x_ref[0:1, :] - stats_ref[1:2, :]
            ey = x_ref[1:2, :] - stats_ref[2:3, :]
            e = jnp.sqrt(ex * ex + ey * ey)
            stats_ref[0:1, :] = stats_ref[0:1, :] + e
            stats_ref[5:6, :] = jnp.maximum(stats_ref[5:6, :], e)
            return 0

        jax.lax.fori_loop(0, t_chunk, tick, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "slam", "block_worlds", "interpret", "t_chunk", "predicated"
    ),
)
def fused_ukf_rollout(
    cfg: Config, landmarks, cmds, seed, slam: bool = True,
    block_worlds: int = 128, interpret: bool = False, noise=None,
    t_chunk: int = 125, predicated: bool | None = None,
):
    """Full T-step sim+UKF rollout for a world batch in one kernel.

    landmarks: (B, N, 2) true maps (also the known map in loc mode);
    cmds: (B, T, 2). Returns dict with per-world err_sum, final true pose,
    final filter state x (B, Du) / P (B, Du, Du), and seen mask (slam).
    """
    if not cfg.constraints.measurements.landmark_id_is_known:
        raise ValueError("fused rollout requires known landmark ids")
    b, n_lm, _ = landmarks.shape
    t_total = cmds.shape[1]
    bl = block_worlds
    if b % bl != 0:
        raise ValueError(f"batch {b} must be a multiple of block_worlds {bl}")
    if t_total % t_chunk != 0:
        t_chunk = t_total
    n_chunks = t_total // t_chunk
    du = 4 + 2 * n_lm if slam else 4
    dup = _round_up(du, 8)

    cmds_t = jnp.transpose(cmds, (1, 2, 0)).astype(jnp.float32)
    lms_t = jnp.transpose(landmarks, (1, 2, 0)).astype(jnp.float32)
    seed_arr = jnp.asarray([seed], jnp.int32)

    # Predication (pivot-skip / update-skip pl.when guards) is forced off in
    # interpret mode, so CPU parity tests exercise only the unpredicated
    # spelling; `predicated` is exposed so scripts/ukf_predication_ab.py can
    # A/B the two kernels bitwise ON HARDWARE. Verified r4 on-chip: all
    # outputs (x, P, err_sum, err_max, seen, update_rejects) bit-identical
    # over 256 worlds x 1000 ticks (ADVICE r3 #4 closed).
    if predicated is None:
        predicated = not interpret
    kernel = _make_kernel(
        cfg, n_lm, t_chunk, du, dup, bl, slam,
        inject_noise=noise is not None,
        predicated=predicated,
    )
    in_specs = [
        pl.BlockSpec((t_chunk, 2, bl), lambda i, tc, *_: (tc, 0, i)),
        pl.BlockSpec((n_lm, 2, bl), lambda i, tc, *_: (0, 0, i)),
    ]
    inputs = [seed_arr, cmds_t, lms_t]
    if noise is not None:
        in_specs.append(
            pl.BlockSpec(
                (t_chunk, 2 * n_lm + 8, bl), lambda i, tc, *_: (tc, 0, i)
            )
        )
        inputs.append(jnp.asarray(noise, jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bl, n_chunks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((8, bl), lambda i, tc, *_: (0, i)),
            pl.BlockSpec((dup, bl), lambda i, tc, *_: (0, i)),
            pl.BlockSpec((dup, dup, bl), lambda i, tc, *_: (0, 0, i)),
            pl.BlockSpec((n_lm, bl), lambda i, tc, *_: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((dup, dup, bl), jnp.float32),  # Cholesky factor L
            pltpu.VMEM((2, dup, bl), jnp.float32),    # +half sigma x/y rows
            pltpu.VMEM((2, dup, bl), jnp.float32),    # -half sigma x/y rows
        ],
    )
    stats, x_out, p_out, seen = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, b), jnp.float32),
            jax.ShapeDtypeStruct((dup, b), jnp.float32),
            jax.ShapeDtypeStruct((dup, dup, b), jnp.float32),
            jax.ShapeDtypeStruct((n_lm, b), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)

    return {
        "err_sum": stats[0],
        "err_max": stats[5],
        "update_rejects": stats[4],  # divergence-guard rejections per world
        "true_pose": jnp.transpose(stats[1:4], (1, 0)),
        "x": jnp.transpose(x_out, (1, 0))[:, :du],
        "P": jnp.transpose(p_out, (2, 0, 1))[:, :du, :du],
        "seen": jnp.transpose(seen, (1, 0)) > 0.5,
    }


def fused_ukf_rollout_sharded(
    cfg: Config, landmarks, cmds, seed, mesh, slam: bool = True,
    block_worlds: int = 128, interpret: bool = False, noise=None,
):
    """Multi-chip fused UKF rollout: shard the world batch over a 1-D mesh.

    Same layout as ops/fused_rollout.fused_ekf_rollout_sharded: worlds are
    fully independent, each device runs the kernel on its shard, reductions
    ride the mesh afterwards, and the PRNG seed is decorrelated per device
    via the mesh axis index.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    b = landmarks.shape[0]
    if b % n_dev != 0:
        raise ValueError(f"batch {b} not divisible by mesh size {n_dev}")

    out_specs = {
        "err_sum": P(axis),
        "err_max": P(axis),
        "update_rejects": P(axis),
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

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    def run(lms_shard, cmds_shard, *rest):
        dev = jax.lax.axis_index(axis)
        local_noise = rest[0] if rest else None
        return fused_ukf_rollout(
            cfg,
            lms_shard,
            cmds_shard,
            seed + dev * jnp.int32(1000003),
            slam=slam,
            block_worlds=block_worlds,
            interpret=interpret,
            noise=local_noise,
        )

    return run(*args)
