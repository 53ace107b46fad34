#!/bin/bash
# (repo copy of /tmp/tpu_chain.sh; a watcher polls the axon tunnel and runs
# this the moment 127.0.0.1:8083 answers: hw tests -> profiles -> bench ->
# at-scale quality run. Re-arm with: bash tools/tpu_watch.sh &)
# Runs the queued TPU work once the tunnel is back. Logs to /tmp/tpu_chain.log
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

echo "=== [1/4] hardware kernel tests $(date)"
SIXDGS_TPU_TESTS=1 timeout 2400 python -m pytest tests/ -m tpu_hw -q

echo "=== [2/4] profile $(date)"
timeout 1500 python tools/profile_raster.py --stages step,pallas,pglue 2>&1 | grep -v WARNING

echo "=== [2b] routing variants $(date)"
timeout 900 python tools/profile_routing.py 2>&1 | grep -v WARNING

echo "=== [2c] kernel shape sweep $(date)"
timeout 900 python tools/profile_kernel_shape.py 2>&1 | grep -v WARNING

echo "=== [3/4] bench $(date)"
timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -3

echo "=== [4/4] at-scale quality run $(date)"
timeout 9000 python tools/quality_workflow.py --workdir /tmp/sixdgs_scale2 \
  --iterations 10000 --size 400 --width 1232 --height 816 \
  --n_train 40 --n_test 8 --n_gt 40000 --n_init 16000 \
  --gt_logscale_shift -1.2 --rasterizer pallas --checkpoint_every 1000 \
  --extra_train_args "--densify_grad_threshold 0.0001" 2>&1 | grep -vE "WARNING|^I0000|oneDNN|cudart"
echo "=== chain done $(date)"
