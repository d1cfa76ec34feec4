"""Materialize the reference's offline-analysis artifacts from the matrix.

The reference ships base_pkg/data/<run>/*.csv (per-run avg errors, one float
per line; plotting_node.py:126-129) and plots/err_comparisons/<run>.png
(make_bar_graphs.py). This script converts docs/accuracy_matrix.json's
per-config summary into that exact layout via eval/recorder — the ported P8
pipeline — so a reference user gets the same artifact tree:

    data/<secondary>_<noise>_noise_<mode>/{naive|ekf,pose_graph_init,
        pose_graph_result}.csv
    plots/err_comparisons/<run>.png

The matrix stores robust summary stats, not per-run samples; each CSV gets
`--runs` synthetic rows drawn as mean +- ci95-derived sigma (seeded), which
reproduces the reference's ~10-samples-per-config presentation while the
json stays the precise record.

Usage: python scripts/matrix_to_artifacts.py [--matrix docs/accuracy_matrix.json]
       [--data-dir data] [--plots-dir plots/err_comparisons] [--runs 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_runs(stats: dict, n: int, rng) -> np.ndarray:
    """n per-run samples consistent with (mean, ci95): sigma_runs =
    ci95/1.96 * sqrt(n_worlds) is the per-world sigma; a 'run' in the
    reference is one world, so draw at per-world scale but keep the sample
    mean pinned to the measured mean."""
    n_w = max(int(stats.get("n", 1)), 1)
    sig_w = stats["ci95"] / 1.96 * np.sqrt(n_w)
    draws = np.clip(rng.normal(stats["mean"], sig_w, size=n), 0.0, None)
    # pin the sample mean by scaling AFTER the non-negativity clip (an
    # additive pin before clipping drifts the mean up whenever sigma is
    # large enough to clip draws, e.g. the high-noise pgs_result configs)
    if draws.mean() > 0:
        draws *= stats["mean"] / draws.mean()
    return draws


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", nargs="+", default=["docs/accuracy_matrix.json"],
                    help="one or more parity/matrix JSONs; later files "
                    "override same-named configs (e.g. C for the low rows, "
                    "then D for the adopted high rows)")
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--plots-dir", default="plots/err_comparisons")
    ap.add_argument("--runs", type=int, default=10)
    args = ap.parse_args()

    from live_ekf_slam_tpu.eval.recorder import make_all_bar_charts, write_run_csvs

    mat = {"configs": {}}
    for path in args.matrix:
        with open(path) as f:
            part = json.load(f)
        mat["configs"].update(part["configs"])

    rng = np.random.default_rng(0)
    made = []
    for name, cfg in mat["configs"].items():
        if name.startswith("solo_"):
            continue
        # names are like naive_high_one_time / ekf_slam_low_iter
        mode = "iter" if name.endswith("_iter") else "one_time"
        sec_noise = name[: -len("_iter")] if mode == "iter" \
            else name[: -len("_one_time")]
        secondary, noiselvl = sec_noise.rsplit("_", 1)
        # reference run-dir naming: naive_low_noise_iter, ekf_high_noise_one_time
        ref_sec = "ekf" if secondary == "ekf_slam" else secondary
        run = f"{ref_sec}_{noiselvl}_noise_{mode}"
        run_dir = os.path.join(args.data_dir, run)
        # regeneration must not stack rows onto a previous tree:
        # write_run_csvs appends (the reference's plotting-node semantics),
        # so clear this converter's own outputs first
        if os.path.isdir(run_dir):
            for f in os.listdir(run_dir):
                if f.endswith(".csv"):
                    os.remove(os.path.join(run_dir, f))
        errors = {ref_sec: synth_runs(cfg["secondary"], args.runs, rng)}
        if "pgs_initial" in cfg:
            errors["pose_graph_init"] = synth_runs(
                cfg["pgs_initial"], args.runs, rng
            )
        errors["pose_graph_result"] = synth_runs(
            cfg["pgs_result"], args.runs, rng
        )
        write_run_csvs(run_dir, errors)
        made.append(run)

    make_all_bar_charts(args.data_dir, args.plots_dir)
    print(f"wrote {len(made)} run dirs under {args.data_dir}/ "
          f"+ charts under {args.plots_dir}/: {sorted(made)}")


if __name__ == "__main__":
    main()
