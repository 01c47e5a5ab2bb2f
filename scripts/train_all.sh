#!/bin/bash
# Batch training driver over a config family (reference `train.sh:4-7` loops
# `bcnf train -c` over configs/runs/hybrid/*).
set -e
FAMILY=${1:-"configs/runs/*_hybrid.yaml"}
for config in $FAMILY; do
    echo "=== training $config ==="
    bcnf-tpu train -c "$config" -f "${@:2}"
done
