"""Render docs/REFERENCE_PARITY.md from the measured parity JSONs.

Inputs (all produced on-chip by scripts/reference_parity.py,
scripts/pgs_budget_probe.py and scripts/noise_profile_probe.py):
  docs/reference_parity.json        — hypothesis C (V_11 x10, W x1), 12 configs
  docs/reference_parity_d.json      — hypothesis D (V_11 x10, W x10), high rows
  docs/reference_parity_equal.json  — rejected hypothesis A (both V dials)
  docs/reference_parity_w.json      — rejected hypothesis B (V and W dials)
  docs/reference_runs_stats.json    — per-run stats of the published CSVs
  docs/pgs_convergence_d.json       — solver-budget convergence path under D

The reference's published numbers are the per-config means of
/root/reference/ekf_ws/src/base_pkg/data/<config>/*.csv (metric:
plotting_node.py:195-218, mean distance of the estimated trajectory from
truth). Its noise profile was never recorded; see reference_parity.py's
docstring for the reconstruction. This report adjudicates the candidate
reconstructions against ALL 22 published numbers, using each published
config's own 10-run spread (reference_runs_stats.json) as the dominant
uncertainty.

Usage: python scripts/parity_report.py [--out docs/REFERENCE_PARITY.md]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

ROWS = [
    "naive_high_one_time", "ekf_slam_high_one_time",
    "naive_high_iter", "ekf_slam_high_iter",
    "naive_low_one_time", "ekf_slam_low_one_time",
    "naive_low_iter", "ekf_slam_low_iter",
]
COLS = ("secondary", "pgs_initial", "pgs_result")
LOW_ROWS = [r for r in ROWS if "_low_" in r]


def load_json(path):
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return None


def pub_lookup(stats, name, col):
    """Published per-run stats entry for (config, column), or None."""
    key = (name.replace("ekf_slam", "ekf")
           .replace("_high_", "_high_noise_")
           .replace("_low_", "_low_noise_"))
    entry = stats.get(key, {})
    if col == "secondary":
        csv = "naive.csv" if name.startswith("naive") else "ekf.csv"
    elif col == "pgs_result":
        csv = "pose_graph_result.csv"
    else:
        csv = ("pose_graph_init.csv" if "pose_graph_init.csv" in entry
               else "i_pgs_old.csv" if "i_pgs_old.csv" in entry else None)
    return entry.get(csv) if csv else None


def scorecard(cfgs, stats):
    """Score a hypothesis' measured configs against all published numbers.

    Returns a list of dicts, one per published number that the hypothesis
    has a measurement for: published mean/ci95 (10-run), repo mean/ci95
    (Monte-Carlo), combined-CI containment, relative error."""
    rows = []
    for name in ROWS:
        st = cfgs.get(name)
        if st is None or "secondary" not in st:
            continue
        for col in COLS:
            # iter-mode published "initial" (i_pgs_old.csv) is a DIFFERENT
            # statistic: the reference feeds each solve back as the next
            # initial estimate (pose_graph.cpp:262-267), so its published
            # initial trails the result by one solve, while this repo's
            # pgs_initial is the seeded node values (secondary poses at
            # node-creation time). Excluded from the totals; shown ‡ in
            # the detail table.
            if name.endswith("_iter") and col == "pgs_initial":
                continue
            pub = pub_lookup(stats, name, col)
            if pub is None:
                continue
            m, ci = st[col]["mean"], st[col]["ci95"]
            comb = math.sqrt(pub["ci95"] ** 2 + ci ** 2)
            rows.append({
                "name": name, "col": col,
                "pub_mean": pub["mean"], "pub_ci": pub["ci95"],
                "mean": m, "ci": ci,
                "inside": abs(m - pub["mean"]) <= comb,
                "rel": (m - pub["mean"]) / pub["mean"],
                "shared": st.get("shared_with_c", False),
            })
    return rows


def summarize(rows):
    if not rows:
        return "—"
    inside = sum(r["inside"] for r in rows)
    close = sum(abs(r["rel"]) <= 0.25 for r in rows)
    med = sorted(abs(r["rel"]) for r in rows)[len(rows) // 2]
    return (f"{inside}/{len(rows)} inside the combined 95% CI, "
            f"{close}/{len(rows)} within 25%, median \\|rel\\| {med:.0%}")


def fmt_pair(ref, st, pub=None):
    r = "—" if ref is None else f"{ref:.3f}"
    if st is None:
        return f"{r} | (pending)"
    comb = st["ci95"] if pub is None else math.sqrt(
        pub["ci95"] ** 2 + st["ci95"] ** 2)
    inside = ref is not None and abs(st["mean"] - ref) <= comb
    mark = " ✓" if inside else ""
    return f"{r} | {st['mean']:.3f} ± {st['ci95']:.3f}{mark}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="docs/reference_parity.json")
    ap.add_argument("--out", default="docs/REFERENCE_PARITY.md")
    args = ap.parse_args()

    c_data = load_json(args.json)
    if c_data is None or c_data.get("profile") != "ang":
        sys.exit(f"{args.json} is not the ang-profile run")
    base_dir = os.path.dirname(args.json) or "."
    d_data = load_json(os.path.join(base_dir, "reference_parity_d.json"))
    stats = load_json(os.path.join(base_dir, "reference_runs_stats.json")) or {}

    cal = c_data["calibration"]
    c_cfgs = c_data["configs"]
    # Hypothesis D measured only the high-noise rows: at the calibrated low
    # scale of 1.0 the W dial is also x1, so C and D are THE SAME config at
    # low noise (make_compat_cfg: w_scale = v_scale when --scale-w) — the
    # low rows are one set of measurements shared by construction, not a
    # copy of convenience.
    d_cfgs = dict(d_data["configs"]) if d_data else {}
    d_low_shared = False
    if d_data and d_data.get("calibration", {}).get("low", {}).get(
            "scale") == 1.0:
        for name in LOW_ROWS:
            if name not in d_cfgs and name in c_cfgs:
                d_cfgs[name] = {**c_cfgs[name], "shared_with_c": True}
                d_low_shared = True

    c_score = scorecard(c_cfgs, stats)
    d_score = scorecard(d_cfgs, stats)

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
    if d_data:
        w("**Adopted reconstruction: hypothesis D** — the operator scaled "
          "the angular process dial AND both sensing dials by 10 (typed the "
          "round numbers V=(0.01, 0.01), W=(0.1, 0.1)). It is the best "
          "joint fit to all 22 published numbers (scorecard below); its "
          "residuals are the naive-secondary pose-graph results, which the "
          "convergence-path probe shows are consistent with the reference's "
          "LM stopping earlier from the poor naive initial than this "
          "repo's solver does (see 'What remains unexplained').\n")

    w("## The unrecorded noise profile\n")
    w("The reference's published CSVs were produced at a noise profile that "
      "was never committed (its `params.yaml` defaults give errors ~10x "
      "smaller). `scripts/noise_profile_probe.py` grid-searched which dial "
      "the operator turned, using the two published high-noise anchors "
      "(naive 2.21–2.28 m, EKF 0.93–1.40 m) as a first discriminator:\n")
    w("| Hypothesis | naive (target 2.21–2.28) | EKF (target 0.93–1.40) | "
      "anchor verdict |")
    w("|---|---|---|---|")
    eq = load_json(os.path.join(base_dir, "reference_parity_equal.json"))
    if eq:
        w(f"| A: both V dials ×9.08 | "
          f"{eq['configs']['solo_naive_high']['naive']['mean']:.2f} | "
          f"{eq['configs']['solo_ekf_slam_high']['ekf_slam']['mean']:.2f} | "
          f"rejected — EKF no better than naive |")
    wj = load_json(os.path.join(base_dir, "reference_parity_w.json"))
    if wj:
        w(f"| B: V and W dials ×9.08 | "
          f"{wj['configs']['solo_naive_high']['naive']['mean']:.2f} | "
          f"{wj['configs']['solo_ekf_slam_high']['ekf_slam']['mean']:.2f} | "
          f"rejected — EKF no better than naive |")
    w(f"| C: angular V dial only ×{cal['high']['scale']:.0f} | "
      f"{c_cfgs['solo_naive_high']['naive']['mean']:.2f} | "
      f"{c_cfgs['solo_ekf_slam_high']['ekf_slam']['mean']:.2f} | "
      f"passes both anchors |")
    if d_data:
        w(f"| **D: V_11 ×10 and W ×10** | "
          f"{d_cfgs['solo_naive_high']['naive']['mean']:.2f} | "
          f"{d_cfgs['solo_ekf_slam_high']['ekf_slam']['mean']:.2f} | "
          f"**passes both anchors** |")
    w("")
    w("A and B fail structurally: scaling the forward dial saturates "
      "against the sim's `d_max` clip (`sim_node.py:218`) and leaves the "
      "compat EKF (which assumes W=I₂) *no better than dead reckoning* — "
      "incompatible with the published 0.93–1.40 m. C and D both pass the "
      "two solo anchors (the naive filter never sees W, and the compat EKF "
      "ignores the true W by the V/W-overwrite quirk), so the anchors "
      "cannot separate them — but the pose-graph columns can, because "
      "through that same quirk (filter.h:110-117) the graph's between-"
      "factor sigmas ARE the sensing covariances: under D the "
      "between-factors loosen 0.01→0.1 while bearing-range factors stay at "
      "(1, 1), a 100× relative reweighting toward landmarks. Scored "
      "against ALL 22 published numbers (combined 95% CI = published "
      "10-run CI ⊕ repo Monte-Carlo CI):\n")
    w("| Hypothesis | all-22 scorecard |")
    w("|---|---|")
    w(f"| C: V_11 ×10, W ×1 | {summarize(c_score)} |")
    if d_score:
        w(f"| **D: V_11 ×10, W ×10 (adopted)** | **{summarize(d_score)}** |")
    w("")

    w("## Calibration\n")
    w("The scalar noise scale is calibrated per regime against the "
      "published naive baseline (dead reckoning is W-blind, so the "
      "calibration holds for C and D alike):\n")
    w("| Regime | dial | target naive (m) | measured naive (m) |")
    w("|---|---|---|---|")
    for reg in ("high", "low"):
        c = cal[reg]
        last = c["history"][-1]
        dial = ("V_11 ×" + f"{c['scale']:g}") if reg == "high" \
            else "none (params.yaml)"
        w(f"| {reg} | {dial} | {c['target_naive_m']:.3f} | "
          f"{last['mean']:.3f} ± {last['ci95']:.3f} |")
    w("")

    w("## Solo filters (context columns)\n")
    w("| Config | published (m) | C (m), n=%d | D (m), n=%d |"
      % (c_data["worlds"], (d_data or c_data)["worlds"]))
    w("|---|---|---|---|")
    pub_span = {"solo_naive_high": "2.209–2.277",
                "solo_ekf_slam_high": "0.930–1.397",
                "solo_naive_low": "0.244–0.270",
                "solo_ekf_slam_low": "0.188–0.267"}
    for name, span in pub_span.items():
        cst = c_cfgs.get(name)
        if cst is None:
            continue
        k = [x for x in cst if x not in ("wall_s", "timing")][0]
        dst = d_cfgs.get(name)
        dtxt = (f"{dst[k]['mean']:.3f} ± {dst[k]['ci95']:.3f}"
                if dst else "—")
        w(f"| {name} | {span} | {cst[k]['mean']:.3f} ± "
          f"{cst[k]['ci95']:.3f} | {dtxt} |")
    w("")
    w("The low-noise solos are identical under C and D: the calibrated low "
      "scale is 1.0, so both dials sit at their params.yaml values.\n")

    headline_cfgs = d_cfgs if d_data else c_cfgs
    w("## The 8 published pose-graph configs (adopted profile%s)\n"
      % (": D" if d_data else ": C"))
    w(f"✓ = the repo mean lies within the combined 95% CI (published "
      f"10-run CI ⊕ repo Monte-Carlo CI; n={c_data['worlds']} worlds "
      f"one-time / {c_data.get('worlds_iter', 128)} iterative). "
      + ("† = low-noise row shared with hypothesis C by construction "
         "(both dials ×1 at the calibrated low scale).\n" if d_low_shared
         else "\n"))
    w("| Config | ref secondary | repo secondary | ref PGS-init | repo "
      "PGS-init | ref PGS-result | repo PGS-result |")
    w("|---|---|---|---|---|---|---|")
    n_done = 0
    for name in ROWS:
        st = headline_cfgs.get(name)
        if st is None or "secondary" not in st:
            w(f"| {name} | (pending) | | | | | |")
            continue
        n_done += 1
        ref = st["reference"]
        tag = "†" if st.get("shared_with_c") else ""
        w(f"| {name}{tag} | "
          f"{fmt_pair(ref['secondary'], st['secondary'], pub_lookup(stats, name, 'secondary'))} | "
          f"{fmt_pair(ref['pgs_initial'], st['pgs_initial'], pub_lookup(stats, name, 'pgs_initial'))} | "
          f"{fmt_pair(ref['pgs_result'], st['pgs_result'], pub_lookup(stats, name, 'pgs_result'))} |")
    w("")

    w("## Scorecard: every published number, C vs D\n")
    w("Published ± is the 95% CI of the reference's own ~10 runs "
      "(docs/reference_runs_stats.json); repo ± is the Monte-Carlo CI. "
      "✓ = inside the combined CI; the last column is D's relative error.\n")
    w("| Config / column | published | C | D | D rel |")
    w("|---|---|---|---|---|")
    c_by_key = {(r["name"], r["col"]): r for r in c_score}
    d_by_key = {(r["name"], r["col"]): r for r in d_score}
    def cell(r):
        if r is None:
            return "—"
        return (f"{r['mean']:.3f} ± {r['ci']:.3f}"
                + (" ✓" if r["inside"] else ""))

    n_excl = 0
    for name in ROWS:
        for col in COLS:
            if name.endswith("_iter") and col == "pgs_initial":
                pub = pub_lookup(stats, name, col)
                cst, dst = c_cfgs.get(name), d_cfgs.get(name)
                if pub is None or cst is None:
                    continue
                n_excl += 1
                dtxt = (f"{dst[col]['mean']:.3f} ± {dst[col]['ci95']:.3f}"
                        if dst and col in dst else "—")
                w(f"| {name}/{col} ‡ | {pub['mean']:.3f} ± "
                  f"{pub['ci95']:.3f} | {cst[col]['mean']:.3f} ± "
                  f"{cst[col]['ci95']:.3f} | {dtxt} | n/a |")
                continue
            dr = d_by_key.get((name, col))
            cr = c_by_key.get((name, col))
            if dr is None and cr is None:
                continue
            any_r = dr or cr
            w(f"| {name}/{col} | {any_r['pub_mean']:.3f} ± "
              f"{any_r['pub_ci']:.3f} | {cell(cr)} | {cell(dr)} | "
              + (f"{dr['rel']:+.0%} |" if dr else "— |"))
    w("")
    if n_excl:
        w("‡ excluded from the totals: the reference's iter-mode published "
          "\"initial\" (`i_pgs_old.csv`) is the fed-back previous solve "
          "(pose_graph.cpp:262-267), a different statistic from this "
          "repo's seeded-node-values initial.\n")
    w(f"Totals — C: {summarize(c_score)}. D: {summarize(d_score)}.\n")

    # ---- W-dial family sweep (r5): C and D are the endpoints of a
    # one-parameter family; the intermediate scales show whether ANY single
    # profile can satisfy all the high-noise columns at once.
    family = [("1 (C)", c_cfgs), ]
    for wname, path in (("3", "reference_parity_w3x.json"),
                        ("5", "reference_parity_w5x.json")):
        fj = load_json(os.path.join(base_dir, path))
        if fj:
            # the low-noise rows are W x1 for EVERY family member (a low-
            # noise W dial is excluded by measurement: W x10 at low noise
            # drives the compat EKF solo to ~0.94 m vs the published
            # 0.19-0.27), so C's low rows are shared exactly as D shares
            # them — one set of measurements, not a copy of convenience.
            cfgs_f = dict(fj["configs"])
            for nm in LOW_ROWS:
                if nm not in cfgs_f and nm in c_cfgs:
                    cfgs_f[nm] = {**c_cfgs[nm], "shared_with_c": True}
            family.append((wname, cfgs_f))
    if d_data:
        family.append(("10 (D)", d_cfgs))
    if len(family) > 2:
        w("### The W-dial family: is there a single profile at all?\n")
        w("C (W ×1) and D (W ×10) are endpoints of a one-parameter family; "
          "`--w-scale` traces the interior (W ×3 and W ×5, 128 worlds "
          "one-time / 64 iterative, on-chip). Every high-noise published "
          "statistic against the family:\n")
        w("| Statistic | published | " +
          " | ".join(f"W ×{n}" for n, _ in family) + " |")
        w("|---|---|" + "---|" * len(family))
        high_rows = [r for r in ROWS if "_high_" in r]
        for name in high_rows:
            for col in COLS:
                pub = pub_lookup(stats, name, col)
                if pub is None or col == "pgs_initial":
                    continue
                cells = []
                for _, cfgs_f in family:
                    st = cfgs_f.get(name)
                    if st is None or col not in st:
                        cells.append("—")
                        continue
                    m, ci = st[col]["mean"], st[col]["ci95"]
                    comb = math.sqrt(pub["ci95"] ** 2 + ci ** 2)
                    mark = " ✓" if abs(m - pub["mean"]) <= comb else ""
                    cells.append(f"{m:.3f}{mark}")
                w(f"| {name}/{col} | {pub['mean']:.3f} ± "
                  f"{pub['ci95']:.3f} | " + " | ".join(cells) + " |")
        w("")
        w("Scorecards per family member — high-noise-only (the 10 numbers "
          "above + the 2 one-time pgs_initial columns) and all 20 "
          "published numbers (low-noise rows are W ×1 for every member — "
          "a hidden low-noise W dial is excluded by measurement, so the "
          "low rows are one shared set). **Reachability** asks whether "
          "the naive-seeded pgs_result misses can be explained by the "
          "solver-convergence DOF: early stopping can only leave the "
          "published value ABOVE the converged optimum, so a converged "
          "mean BELOW published is explainable, one ABOVE it is a "
          "structural miss no stopping rule can produce.\n")
        w("| Profile | high-noise | all 20 | naive pgs_result misses "
          "reachable by early stopping? |")
        w("|---|---|---|---|")
        for wname, cfgs_f in family:
            sc = scorecard(cfgs_f, stats)
            hs = [r for r in sc if "_high_" in r["name"]]
            # reachability of the naive-seeded pgs_result columns
            reach, labels = True, []
            for nm in ("naive_high_one_time", "naive_high_iter"):
                r = next((x for x in sc if x["name"] == nm
                          and x["col"] == "pgs_result"), None)
                if r is None or r["inside"]:
                    continue
                comb = math.sqrt(r["pub_ci"] ** 2 + r["ci"] ** 2)
                ok = r["mean"] <= r["pub_mean"] + comb
                reach &= ok
                labels.append(
                    f"{'converged below' if ok else 'UNREACHABLE: converged'}"
                    f" {r['mean']:.2f} vs {r['pub_mean']:.2f}")
            verdict = "no misses" if not labels else (
                ("yes — " if reach else "no — ") + "; ".join(labels))
            w(f"| W ×{wname} | {summarize(hs)} | {summarize(sc)} | "
              f"{verdict} |")
        w("")

    conv = load_json(os.path.join(base_dir, "pgs_convergence_d.json"))
    if conv:
        w("## The naive-secondary residual: a solver-convergence DOF\n")
        w("D's remaining misses concentrate where the pose graph is "
          "initialized from dead reckoning at high noise "
          "(naive_high_*/pgs_result: repo converges ~0.6 m, published "
          "0.93–1.00 m). The reference solves with GTSAM LM from that "
          "initial estimate (pose_graph.cpp:283-284) and stops on its "
          "default relative-decrease tolerance; this repo's bulk solver "
          "runs a fixed Schur-PCG GN budget to convergence. Sweeping the "
          "budget traces the optimizer's convergence path "
          f"(naive_high_one_time under D, n={conv['worlds']} worlds "
          "on-chip, `docs/pgs_convergence_d.json`):\n")
        w("| GN budget | PGS result (m) |")
        w("|---|---|")
        path_vals = []
        for k, v in conv["budgets"].items():
            path_vals.append((k, v["pgs_result"]["mean"],
                              v["pgs_result"]["ci95"]))
            w(f"| {k.split('x')[0]} | {v['pgs_result']['mean']:.3f} ± "
              f"{v['pgs_result']['ci95']:.3f} |")
        w("")
        means = [p[1] for p in path_vals]
        pub = pub_lookup(stats, "naive_high_one_time", "pgs_result")
        if pub and means and min(means) <= pub["mean"] <= max(
                max(means), conv.get("init_mean", 2.27)):
            w(f"The published {pub['mean']:.3f} ± {pub['ci95']:.3f} lies ON "
              "this path — between partial and full convergence — so the "
              "published naive-config results are consistent with profile D "
              "plus an optimizer that stops earlier from a poor initial "
              "estimate than this repo's fixed-budget solver does. The "
              "repo's converged optimum is *better* than the published "
              "numbers, not differently wrong.\n")

    w("## What remains unexplained\n")
    misses = [r for r in d_score if not r["inside"]]
    if misses:
        w("Under the adopted profile D, the numbers outside the combined "
          "95% CI are:\n")
        for r in sorted(misses, key=lambda r: -abs(r["rel"])):
            w(f"- `{r['name']}/{r['col']}`: published {r['pub_mean']:.3f} ± "
              f"{r['pub_ci']:.3f} vs repo {r['mean']:.3f} ± {r['ci']:.3f} "
              f"({r['rel']:+.0%})")
        w("")
    w("Three structural facts bound what any single-profile reconstruction "
      "can achieve:\n")
    w("1. **The published data is internally inconsistent at its own CI "
      "level in places.** The EKF secondary column is the same filter at "
      "the same nominal config in both high-noise run dirs, yet publishes "
      "0.930 ± 0.298 (one_time) and 1.397 ± 0.705 (iter) — a 0.47 m "
      "spread between means of identical configurations. Any single "
      "profile produces ONE value for that column (D: ~1.33, inside the "
      "iter CI, just outside the one_time CI).")
    w("2. **The naive-config pose-graph results carry a solver-convergence "
      "degree of freedom** the published CSVs don't record (GTSAM LM "
      "stopping criteria vs this repo's fixed budget) — see the "
      "convergence-path section: the repo's solver converges past the "
      "published point to a better optimum.")
    w("3. **The low-noise rows are reproduced to 0.02–0.05 m absolute** "
      "(all within 10–25% relative) but several sit outside the published "
      "CIs, which are extremely tight there (±0.012–0.055 m on ~10 runs); "
      "at that resolution unrecorded details (exact map seeds, TSP tour "
      "lengths, matplotlib-era metric sampling) dominate.")
    w("")

    w("## Appendix: the exclusion chain that led to D\n")
    w("Before D was identified, the high-noise pgs_result residual under C "
      "(repo 1.83 vs published 0.93 for the naive secondary — above even "
      "the published 10-run max of 1.79) was probed mechanism by "
      "mechanism (`scripts/pgs_budget_probe.py`, 8 worlds, T=1000, "
      "C profile):\n")
    w("| Probe | result | verdict |")
    w("|---|---|---|")
    bp = load_json(os.path.join(base_dir, "pgs_budget_probe.json"))
    if bp:
        span = " → ".join(
            f"{k}: {v['pgs_result']['mean']:.2f}"
            for k, v in bp["budgets"].items())
        w(f"| Solver budget (GN×CG sweep) | {span} | converged by 150×40 — "
          "not an iteration-budget artifact |")
    cp = load_json(os.path.join(base_dir, "pgs_chordal_probe.json"))
    if cp:
        k, v = next(iter(cp["budgets"].items()))
        w(f"| Chordal cold-start (vs secondary seeding) | {k}: "
          f"{v['pgs_result']['mean']:.2f} | identical optimum — not an "
          "initialization basin |")
    dp = load_json(os.path.join(base_dir, "pgs_dense_probe.json"))
    if dp:
        k, v = next(iter(dp["budgets"].items()))
        w(f"| Graduated dense LM (GTSAM-style, n={dp['worlds']}) | init "
          f"{v['pgs_initial']['mean']:.2f} → {v['pgs_result']['mean']:.2f} | "
          "same relative improvement — not GN-vs-LM |")
    w("")
    w("The graph noise wiring was audited against the reference: "
      "`readCommonParams` (filter.h:110-117) overwrites V with the sensing "
      "covariances and leaves W at identity, so the reference graph's "
      "between-factor sigmas are `(W_00, W_00, W_11)` and its "
      "bearing-range sigmas are `(1, 1)` — exactly what the repo's compat "
      "path builds (`_noise_sigmas`, models/posegraph.py). Under C that "
      "makes the between-factors sigma (0.01, 0.01, 0.01); under D they "
      "loosen to (0.1, 0.1, 0.1), which is the reweighting that closes "
      "the pgs_result gap.\n")
    w("### Remaining-DOF sweep (landmark density, sensing range)\n")
    w("| Variant | worlds | PGS result (naive sec., high, C profile) | "
      "source |")
    w("|---|---|---|---|")
    w("| nl=20 (committed), 50×40 | 256, chip | 1.83 ± 0.11 | headline "
      "C table |")
    w("| nl=20, range_max 3→6 m, 150×40 | 8, CPU | 1.50 | "
      "docs/pgs_range6.json |")
    w("| nl=40, 150×40 | 8, CPU | 1.72 | docs/pgs_lmdensity_40.json |")
    w("| nl=60, 150×40 | 8, CPU | 0.91 | docs/pgs_lmdensity_60.json |")
    lm = load_json(os.path.join(base_dir, "parity_lm60.json"))
    if lm:
        w(f"| nl=60, 50×40 | {lm['worlds']}, chip | "
          f"{lm['pgs_result']['mean']:.2f} ± {lm['pgs_result']['ci95']:.2f} "
          "| docs/parity_lm60.json |")
    for path, label in (
            ("parity_lm60_150x40.json", "nl=60, 150×40"),
            ("parity_lm20_150x40.json", "nl=20, 150×40"),
            ("pgs_lmdensity_60_w32.json", "nl=60, 150×40 (CPU)")):
        sweep = load_json(os.path.join(base_dir, path))
        if sweep is None:
            continue
        if "budgets" in sweep:
            st = next(iter(sweep["budgets"].values()))["pgs_result"]
        else:
            st = sweep["pgs_result"]
        w(f"| {label} | {sweep['worlds']}, "
          f"{'CPU' if 'budgets' in sweep else 'chip'} | "
          f"{st['mean']:.2f} ± {st['ci95']:.2f} | docs/{path} |")
    w("| published | ~10 runs | 0.93 | base_pkg/data |")
    w("")
    w("An 8-world nl=60 probe initially suggested landmark density was the "
      "lever (0.91, matching the published 0.93); a 64-world on-chip rerun "
      "did NOT reproduce it (1.79 ± 0.27) — the small-n result confounded "
      "density with the solver budget and its particular 8 maps. Density "
      "and sensing range are excluded at matched budget and proper world "
      "count; the dial that actually closes the gap is D's between-factor "
      "reweighting above.\n")
    w("Wall-time note: each one-time PGS config is ~8–9 min on one chip at "
      "256 worlds; the reference's equivalent is ~10 sequential rospy "
      "runs. C rows: `scripts/reference_parity.py --profile ang`; D rows: "
      "`--profile ang --scale-w` (resume-safe; see "
      "`scripts/tpu_queue_r4i.sh`, `scripts/tpu_queue_r5.sh`).\n")

    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({n_done}/8 PGS rows)")


if __name__ == "__main__":
    main()
