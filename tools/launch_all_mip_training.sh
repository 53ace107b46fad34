#!/bin/sh
# Train all Mip-NeRF 360 scenes (parity with the reference launcher).
# Usage: tools/launch_all_mip_training.sh /data/datasets/mip360
ROOT=${1:-/data/datasets/mip360}
for SCENE in bicycle bonsai counter garden kitchen room stump; do
    python3 -m sixdgs_tpu.apps.train_gs --source_path "$ROOT/$SCENE" --eval
done
