#!/bin/bash
# Round-5 post-run chip queue (run AFTER the tandt_r5 run frees the
# chip — one TPU process at a time). Verify recipe first, then the
# band-segsum A/B. Appends to the log; the session interprets results
# before flipping any defaults.
set -u
LOG=${1:-/tmp/r5_experiments.log}
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >> "$LOG"
  timeout "${T:-1500}" env ${ENV:-} "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
  sleep 5
}

# 1. verify recipe (.claude/skills/verify): on-chip kernel correctness,
#    then the fast end-to-end drive through the REAL train loop
run python scripts/tpu_kernel_check.py
T=900 run python scripts/validate_e2e.py --iters 800 --size 128 \
  --out /tmp/verify_e2e_r5 --min-psnr 33

# 2. band-segsum A/B at the three bench scales (single points)
ENV="EGS_TPU_BWD_REDUCE=scan" run python bench.py 100000
ENV="EGS_TPU_BWD_REDUCE=band" run python bench.py 100000
ENV="EGS_TPU_BWD_REDUCE=scan" run python bench.py 1000000
ENV="EGS_TPU_BWD_REDUCE=band" run python bench.py 1000000
ENV="EGS_TPU_BWD_REDUCE=scan" T=2400 run python bench.py 3000000
ENV="EGS_TPU_BWD_REDUCE=band" T=2400 run python bench.py 3000000

# 3. margin tightening at 1M under the winner
ENV="EGS_TPU_BWD_REDUCE=band" run python bench.py 1000000 800 800 32 1.1
