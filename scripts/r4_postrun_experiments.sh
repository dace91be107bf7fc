#!/bin/bash
# Round-4 post-run experiment queue (run AFTER the tandt 30k run frees
# the chip — one TPU process at a time). Each block appends to the log.
set -u
LOG=${1:-/tmp/r4_experiments.log}
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >> "$LOG"
  timeout "${T:-1500}" "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
  sleep 10
}

# 0. tandt-run wrap-up: fit ceiling of the unbounded colmap scene (the
#    trained PSNR reads as "gap to this"), then the run report
run python scripts/fit_ceiling.py --data .tandt_r4/data --format colmap \
  --layout unbounded --aniso 4.0 --gt-gaussians 150000 --gt-sh-degree 2 \
  --frames 4
run python scripts/report_run.py /tmp/tandt_r4_full.log

# 1. layout-padding probe: is a [C,3] f32 elementwise op physically
#    moving 512 B rows? decides whether packed per-Gaussian state is the
#    next structural win
run python scripts/probe_layout_pad.py

# 2. 100k ceiling probes: tile_size 16, batch 8
run python bench.py 100000 800 800 16
run python bench.py 100000 --batch=8

# 3. 1M margin tightening
run python bench.py 1000000 800 800 32 1.1

# 4. bf16 quality regression: the round-3 hard-regime 6000-iter run
#    (expect PSNR ~35.4 as in docs/PLAN.md; bf16 grad rows + flat SH
#    must not move it)
T=3600 run python scripts/validate_e2e.py --iters 6000 --size 800 \
  --gt-gaussians 20000 --gt-sh-degree 2 --cameras 48 --masks \
  --out /tmp/r4_hard6k --min-psnr 33
