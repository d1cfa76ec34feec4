"""Render docs/REFERENCE_PARITY.md from the measured parity JSONs.

Inputs (all produced on-chip by scripts/reference_parity.py and
scripts/noise_profile_probe.py):
  docs/reference_parity.json        — profile=ang full run (8 PGS + 4 solos)
  docs/reference_parity_equal.json  — rejected hypothesis A (both V dials)
  docs/reference_parity_w.json      — rejected hypothesis B (V and W dials)
  docs/noise_profile_probe.json     — the 64-world discriminator grid

The reference's published numbers are the per-config means of
/root/reference/ekf_ws/src/base_pkg/data/<config>/*.csv (metric:
plotting_node.py:195-218, mean distance of the estimated trajectory from
truth). Its noise profile was never recorded; see reference_parity.py's
docstring for the reconstruction.

Usage: python scripts/parity_report.py [--out docs/REFERENCE_PARITY.md]
"""
from __future__ import annotations

import argparse
import json
import sys

ROWS = [
    "naive_high_one_time", "ekf_slam_high_one_time",
    "naive_high_iter", "ekf_slam_high_iter",
    "naive_low_one_time", "ekf_slam_low_one_time",
    "naive_low_iter", "ekf_slam_low_iter",
]


def fmt_pair(ref, st):
    r = "—" if ref is None else f"{ref:.3f}"
    if st is None:
        return f"{r} | (pending)"
    lo = st["mean"] - st["ci95"]
    hi = st["mean"] + st["ci95"]
    inside = ref is not None and lo <= ref <= hi
    mark = " ✓" if inside else ""
    return f"{r} | {st['mean']:.3f} ± {st['ci95']:.3f}{mark}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="docs/reference_parity.json")
    ap.add_argument("--out", default="docs/REFERENCE_PARITY.md")
    args = ap.parse_args()

    with open(args.json) as f:
        d = json.load(f)
    if d.get("profile") != "ang":
        sys.exit(f"{args.json} is not the ang-profile run")

    cal = d["calibration"]
    cfgs = d["configs"]

    lines = []
    w = lines.append
    w("# Reference-magnitude parity\n")
    w("Number-for-number comparison against the only quantitative results "
      "the reference ships: the per-config means of its 8 published run "
      "directories (`base_pkg/data/<config>/*.csv`, metric defined at "
      "`plotting_node.py:195-218`). Every repo number below was measured "
      "on the TPU chip at T=1000 with `CompatConfig.all_on()` (the "
      "reference's V/W swap, weak (1.3, 1.3, 1.2) prior, and all quirk "
      "flags) under the reconstructed noise profile.\n")

    w("## The unrecorded noise profile\n")
    w("The reference's published CSVs were produced at a noise profile that "
      "was never committed (its `params.yaml` defaults give errors ~10x "
      "smaller). `scripts/noise_profile_probe.py` grid-searched which dial "
      "the operator turned, using the two published high-noise anchors "
      "(naive 2.21–2.28 m, EKF 0.93–1.40 m) as a 2-point discriminator:\n")
    w("| Hypothesis | naive (target 2.21–2.28) | EKF (target 0.93–1.40) | verdict |")
    w("|---|---|---|---|")
    try:
        with open("docs/reference_parity_equal.json") as f:
            eq = json.load(f)["configs"]
        w(f"| A: both V dials ×9.08 | "
          f"{eq['solo_naive_high']['naive']['mean']:.2f} | "
          f"{eq['solo_ekf_slam_high']['ekf_slam']['mean']:.2f} | "
          f"rejected — EKF no better than naive |")
    except (OSError, KeyError):
        pass
    try:
        with open("docs/reference_parity_w.json") as f:
            wj = json.load(f)["configs"]
        w(f"| B: V and W dials ×9.08 | "
          f"{wj['solo_naive_high']['naive']['mean']:.2f} | "
          f"{wj['solo_ekf_slam_high']['ekf_slam']['mean']:.2f} | "
          f"rejected — EKF no better than naive |")
    except (OSError, KeyError):
        pass
    w(f"| **C: angular V dial only ×{cal['high']['scale']:.0f}** | "
      f"{cfgs['solo_naive_high']['naive']['mean']:.2f} | "
      f"{cfgs['solo_ekf_slam_high']['ekf_slam']['mean']:.2f} | "
      f"**reproduces both anchors** |")
    w("")
    w("Hypothesis C wins for a structural reason: angular drift is the "
      "error component a weak-gain compat filter (which assumes W=I₂) can "
      "still correct from repeated landmark sightings, while scaled forward "
      "noise saturates against the sim's `d_max` clip "
      "(`sim_node.py:218`) and is nearly unobservable to it. Scaling both "
      "dials makes the compat EKF *no better than dead reckoning* — "
      "incompatible with the published 0.93–1.40 m.\n")

    w("## Calibration\n")
    w("| Regime | dial | target naive (m) | measured naive (m) |")
    w("|---|---|---|---|")
    for reg in ("high", "low"):
        c = cal[reg]
        last = c["history"][-1]
        dial = ("V_11 ×" + f"{c['scale']:g}") if reg == "high" else "none (params.yaml)"
        w(f"| {reg} | {dial} | {c['target_naive_m']:.3f} | "
          f"{last['mean']:.3f} ± {last['ci95']:.3f} |")
    w("")

    w("## Solo filters (context columns)\n")
    w("| Config | published (m) | repo (m), n=%d |" % d["worlds"])
    w("|---|---|---|")
    pub = {"solo_naive_high": "2.209–2.277", "solo_ekf_slam_high": "0.930–1.397",
           "solo_naive_low": "0.244–0.270", "solo_ekf_slam_low": "0.188–0.267"}
    for name, span in pub.items():
        st = cfgs.get(name)
        if st is None:
            continue
        k = [x for x in st if x not in ("wall_s", "timing")][0]
        w(f"| {name} | {span} | {st[k]['mean']:.3f} ± {st[k]['ci95']:.3f} |")
    w("")

    w("## The 8 published pose-graph configs\n")
    w(f"✓ = the published mean lies inside the repo's 95% Monte-Carlo CI "
      f"(n={d['worlds']} worlds one-time / {d.get('worlds_iter', 128)} "
      f"iterative vs the reference's ~10 runs per config).\n")
    w("| Config | ref secondary | repo secondary | ref PGS-init | repo "
      "PGS-init | ref PGS-result | repo PGS-result |")
    w("|---|---|---|---|---|---|---|")
    n_done = 0
    for name in ROWS:
        st = cfgs.get(name)
        ref = st["reference"] if st else None
        if st is None:
            w(f"| {name} | (pending) | | | | | |")
            continue
        n_done += 1
        w(f"| {name} | {fmt_pair(ref['secondary'], st['secondary'])} | "
          f"{fmt_pair(ref['pgs_initial'], st['pgs_initial'])} | "
          f"{fmt_pair(ref['pgs_result'], st['pgs_result'])} |")
    w("")

    # residual-gap commentary, computed
    w("## Reading the table\n")
    gaps = []
    for name in ROWS:
        st = cfgs.get(name)
        if not st:
            continue
        for col in ("secondary", "pgs_initial", "pgs_result"):
            ref = st["reference"][col]
            if ref is None:
                continue
            m, ci = st[col]["mean"], st[col]["ci95"]
            rel = (m - ref) / ref
            gaps.append((name, col, ref, m, ci, rel))
    within = [g for g in gaps if abs(g[3] - g[2]) <= g[4]]
    close25 = [g for g in gaps if abs(g[5]) <= 0.25]
    w(f"Of {len(gaps)} published numbers, {len(within)} fall inside the "
      f"repo's 95% CI and {len(close25)} are within 25% relative. The "
      "reference's side of the comparison is a mean over ~10 runs with no "
      "recorded seed or CI — run-to-run spread of that size is visible in "
      "its own CSVs (docs/BENCHMARKS.md quotes per-run ranges), so "
      "CI-containment against a 10-run mean is a strict bar.\n")
    worst = max(gaps, key=lambda g: abs(g[5])) if gaps else None
    if worst:
        w(f"Largest relative gap: `{worst[0]}/{worst[1]}` — published "
          f"{worst[2]:.3f} vs repo {worst[3]:.3f} ± {worst[4]:.3f} "
          f"({worst[5]:+.0%}).\n")
    w("Wall-time note: each one-time PGS config is ~8–9 min on one chip at "
      "256 worlds; the reference's equivalent is ~10 sequential rospy runs. "
      "All rows were produced by `scripts/reference_parity.py --profile ang` "
      "(resume-safe; see `scripts/tpu_queue_r4f.sh`).\n")

    w("## The high-noise pgs_result gap: what it is NOT\n")
    w("The one systematic residual is `pgs_result` at high noise (repo 1.83 "
      "vs published 0.93 for the naive secondary — above even the published "
      "10-run max of 1.79, so not Monte-Carlo luck). Three mechanisms were "
      "probed and excluded (`scripts/pgs_budget_probe.py`, 8 worlds, "
      "T=1000, calibrated profile):\n")
    w("| Probe | result | verdict |")
    w("|---|---|---|")
    try:
        with open("docs/pgs_budget_probe.json") as f:
            bp = json.load(f)["budgets"]
        span = " → ".join(
            f"{k}: {v['pgs_result']['mean']:.2f}" for k, v in bp.items())
        w(f"| Solver budget (GN×CG sweep) | {span} | converged by 150×40 — "
          "not an iteration-budget artifact |")
    except (OSError, KeyError):
        pass
    try:
        with open("docs/pgs_chordal_probe.json") as f:
            cp = json.load(f)["budgets"]
        k, v = next(iter(cp.items()))
        w(f"| Chordal cold-start (vs secondary seeding) | {k}: "
          f"{v['pgs_result']['mean']:.2f} | identical optimum — not an "
          "initialization basin |")
    except (OSError, KeyError):
        pass
    try:
        with open("docs/pgs_dense_probe.json") as f:
            dp = json.load(f)
        k, v = next(iter(dp["budgets"].items()))
        w(f"| Graduated dense LM (GTSAM-style, n={dp['worlds']}) | init "
          f"{v['pgs_initial']['mean']:.2f} → {v['pgs_result']['mean']:.2f} | "
          "same relative improvement — not GN-vs-LM |")
    except (OSError, KeyError):
        pass
    w("")
    w("The graph noise wiring was also audited against the reference: "
      "`readCommonParams` (filter.h:110-117) overwrites V with the sensing "
      "covariances and leaves W at identity, so the reference graph's "
      "between-factor sigmas are `(W_00, W_00, W_11)` = (0.01, 0.01, 0.01) "
      "and its bearing-range sigmas are `(1, 1)` — which is exactly what "
      "the repo's compat path builds (`_noise_sigmas`, "
      "models/posegraph.py).\n")

    w("## Remaining-DOF sweep: landmark density and sensing range\n")
    w("With solver, initialization, and weighting excluded, the remaining "
      "degrees of freedom are experiment config the published CSVs never "
      "recorded. Sweeping them:\n")
    w("| Variant | worlds | PGS result (naive sec., high) | source |")
    w("|---|---|---|---|")
    w("| nl=20 (committed), 50×40 | 256, chip | 1.83 ± 0.11 | headline "
      "table |")
    w("| nl=20, range_max 3→6 m, 150×40 | 8, CPU | 1.50 | "
      "docs/pgs_range6.json |")
    w("| nl=40, 150×40 | 8, CPU | 1.72 | docs/pgs_lmdensity_40.json |")
    w("| nl=60, 150×40 | 8, CPU | 0.91 | docs/pgs_lmdensity_60.json |")
    try:
        with open("docs/parity_lm60.json") as f:
            lm = json.load(f)
        w(f"| nl=60, 50×40 | {lm['worlds']}, chip | "
          f"{lm['pgs_result']['mean']:.2f} ± {lm['pgs_result']['ci95']:.2f} "
          "| docs/parity_lm60.json |")
    except OSError:
        pass
    for path, label in (
            ("docs/parity_lm60_150x40.json", "nl=60, 150×40"),
            ("docs/parity_lm20_150x40.json", "nl=20, 150×40"),
            ("docs/pgs_lmdensity_60_w32.json", "nl=60, 150×40 (CPU)")):
        try:
            with open(path) as f:
                d = json.load(f)
            if "budgets" in d:
                st = next(iter(d["budgets"].values()))["pgs_result"]
            else:
                st = d["pgs_result"]
            w(f"| {label} | {d['worlds']}, "
              f"{'CPU' if 'budgets' in d else 'chip'} | "
              f"{st['mean']:.2f} ± {st['ci95']:.2f} | {path} |")
        except OSError:
            pass
    w("| published | ~10 runs | 0.93 | base_pkg/data |")
    w("")
    try:
        with open("docs/reference_parity_d.json") as f:
            dd = json.load(f)
        w("## Hypothesis D: the operator scaled W too\n")
        w("The exclusion chain above prompted re-examining the graph's "
          "*between-factor* weighting as a function of the unrecorded "
          "profile. Through the V/W-overwrite quirk, the graph's odometry "
          "sigmas ARE the sensing covariances — so if the operator scaled "
          "the sensing dials along with the angular process dial "
          "(V_11 ×10 **and** W ×10, i.e. typed the round numbers "
          "V=(0.01, 0.01), W=(0.1, 0.1)), the between-factors loosen "
          "0.01→0.1 while bearing-range factors stay at (1,1): a 100× "
          "relative reweighting toward landmarks that restores exactly the "
          "correction capacity the V-only reconstruction lacked. Measured "
          "under that profile (`--scale-w`, docs/reference_parity_d.json):\n")
        w("| Config | ref secondary | repo secondary | ref PGS-init | repo "
          "PGS-init | ref PGS-result | repo PGS-result |")
        w("|---|---|---|---|---|---|---|")
        for name in ROWS:
            st = dd["configs"].get(name)
            if st is None or "secondary" not in st:
                continue
            ref = st["reference"]
            w(f"| {name} | {fmt_pair(ref['secondary'], st['secondary'])} | "
              f"{fmt_pair(ref['pgs_initial'], st['pgs_initial'])} | "
              f"{fmt_pair(ref['pgs_result'], st['pgs_result'])} |")
        for name in ("solo_naive_high", "solo_ekf_slam_high"):
            st = dd["configs"].get(name)
            if st is None:
                continue
            filt = "ekf_slam" if "ekf" in name else "naive"
            w(f"| {name} | — | {st[filt]['mean']:.3f} ± "
          f"{st[filt]['ci95']:.3f} | | | | |")
        w("")
        w("Under hypothesis D every anchor family is simultaneously "
          "consistent with the published data: the naive rows are "
          "unchanged (dead reckoning never sees W), the EKF solo lands "
          "inside the published 0.93–1.40 run band, and the pose-graph "
          "result — the one statistic hypothesis C missed — moves onto "
          "the published values. The low-noise rows are identical under "
          "C and D (the calibrated low scale is 1.0). Hypothesis C "
          "remains the headline table above because it reproduces the "
          "solo-EKF mean more tightly; D is the better *joint* "
          "reconstruction once the pose-graph anchor is included.\n")
    except OSError:
        pass

    w("The 8-world nl=60 probe initially suggested landmark density was "
      "the lever (0.91, matching the published 0.93, with the naive and "
      "EKF anchors surviving: naive 2.36 ± 0.29, EKF 0.74 ± 0.20 at 32 "
      "worlds — docs/pgs_lmdensity_anchors.json). A 64-world on-chip rerun "
      "at the default 50×40 budget did NOT reproduce the effect (1.79 ± "
      "0.27), so the small-n result confounds density with the solver "
      "budget and with its particular 8 maps; the matched-budget 64-world "
      "A/B rows above are the controlled comparison. Until a variant "
      "reproduces 0.93 at a proper world count, the honest conclusion "
      "stands at: the residual is real, it is not solver convergence, "
      "initialization, weighting, sensing range, or (at matched budget) "
      "landmark density alone — it lives in run config the reference "
      "never recorded, and single-dimension sweeps of the two most "
      "plausible candidates have not reproduced it.\n")

    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({n_done}/8 PGS rows)")


if __name__ == "__main__":
    main()
