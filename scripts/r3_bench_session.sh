#!/bin/bash
# Round-3 on-chip A/B session (run AFTER the 30k run frees the chip).
# Each line prints one JSON result; failures don't stop the session.
set -x
cd /root/repo

python scripts/profile_step9.py 1000000 2>&1 | grep -v WARNING

echo "== 1M: pallas chain =="
EGS_TPU_BWD_REDUCE=pallas timeout 700 python bench.py 1000000 2>&1 | tail -1
echo "== 1M: pallas chain + pallas binning =="
EGS_TPU_BWD_REDUCE=pallas EGS_TPU_BINNING=pallas timeout 700 \
  python bench.py 1000000 2>&1 | tail -1
echo "== 1M: + margin 1.15 =="
EGS_TPU_BWD_REDUCE=pallas EGS_TPU_BINNING=pallas timeout 700 \
  python bench.py 1000000 800 800 32 1.15 2>&1 | tail -1
echo "== 100k: pallas chain + binning =="
EGS_TPU_BWD_REDUCE=pallas EGS_TPU_BINNING=pallas timeout 600 \
  python bench.py 100000 2>&1 | tail -1
echo "== 100k: scan chain + pallas binning =="
EGS_TPU_BINNING=pallas timeout 600 python bench.py 100000 2>&1 | tail -1
echo "== 400px batch=1 =="
timeout 600 python bench.py 100000 400 400 2>&1 | tail -1
echo "== 400px batch=4 =="
timeout 700 python bench.py 100000 400 400 --batch=4 2>&1 | tail -1
echo "== 3M probe (best config) =="
EGS_TPU_BWD_REDUCE=pallas EGS_TPU_BINNING=pallas timeout 900 \
  python bench.py 3000000 2>&1 | tail -1
