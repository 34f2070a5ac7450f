#!/usr/bin/env bash
# Demo runs mirroring the reference's demo.bat (the de-facto integration
# test): cones (dual view), teddy, and - when the MC-CNN volume has been
# downloaded - Adirondack.
set -e
bin="python -m localexpstereo_tpu.cli.main"
dataroot="${DATA_ROOT:-/root/reference/data}"
results="${RESULTS_ROOT:-./results}"
mkdir -p "$results"

$bin -targetDir "$dataroot/MiddV2/cones" -outputDir "$results/cones" \
     -mode MiddV2 -smooth_weight 1 -doDual 1
$bin -targetDir "$dataroot/MiddV2/teddy" -outputDir "$results/teddy" \
     -mode MiddV2 -smooth_weight 1
if [ -f "$dataroot/MiddV3/trainingH/Adirondack/im0.acrt" ]; then
  $bin -targetDir "$dataroot/MiddV3/trainingH/Adirondack" \
       -outputDir "$results/Adirondack" -mode MiddV3 -smooth_weight 0.5
fi
