#!/bin/sh
# Train all Tanks&Temples scenes (parity with the reference launcher).
# Usage: tools/launch_all_tanks_and_temple_training.sh /data/datasets/TanksAndTemple
ROOT=${1:-/data/datasets/TanksAndTemple}
for SCENE in Barn Caterpillar Family Ignatius Truck; do
    python3 -m sixdgs_tpu.apps.train_gs --source_path "$ROOT/$SCENE" --eval --white_background
done
