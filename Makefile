# Developer entry points. The TPU targets assume the axon tunnel is up;
# everything else runs on CPU (tests force a virtual 8-device CPU mesh).

.PHONY: test test-quick native bench bench-ukf bench-iekf matrix parity artifacts consistency demo dryrun clean

test:
	python -m pytest tests/ -q

test-quick:     ## edit-loop tier: skips @pytest.mark.slow (<~3 min on CPU)
	python -m pytest tests/ -q -m "not slow"

native:
	$(MAKE) -C native

bench:          ## headline EKF benchmark on the TPU (one JSON line)
	python bench.py

bench-ukf:
	BENCH_FILTER=ukf_slam python bench.py

bench-iekf:
	BENCH_FILTER=iekf_slam python bench.py

matrix:         ## full accuracy matrix (TPU; resumes from the output file)
	python scripts/accuracy_matrix.py --out docs/accuracy_matrix_v2.json

parity:         ## published-magnitude parity vs the reference CSVs (TPU; resume-safe)
	python scripts/reference_parity.py --out docs/reference_parity.json
	python scripts/parity_report.py

artifacts:      ## reference-layout data/ + plots/ trees (calibrated + honest; CPU)
	JAX_PLATFORMS=cpu MPLBACKEND=Agg python scripts/matrix_to_artifacts.py \
		--matrix docs/reference_parity.json docs/reference_parity_w5x.json
	JAX_PLATFORMS=cpu MPLBACKEND=Agg python scripts/matrix_to_artifacts.py \
		--matrix docs/accuracy_matrix_v2.json \
		--data-dir data/honest_mode \
		--plots-dir plots/err_comparisons_honest_mode

consistency:    ## NEES comparison EKF vs RI-EKF (CPU-friendly)
	JAX_PLATFORMS=cpu python scripts/consistency.py

demo:           ## headless filter demo (CPU)
	JAX_PLATFORMS=cpu MPLBACKEND=Agg python -m live_ekf_slam_tpu.cli \
		filter_demo_results_only --filter ekf_slam --steps 200

dryrun:         ## multi-chip sharding dryrun on a virtual CPU mesh
	python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
