#!/bin/bash
# Adaptation-curve diagnosis sweep (VERDICT r2 item 1): short runs over
# {adaptive inner-KL, inner_lr, seed, horizon} on the two envs whose
# round-2 curves were flat. One at a time: the TPU chip claim is
# exclusive. Pass config names to run a subset.
set -u
cd /root/repo
mkdir -p benchmarks/diag
NAMES=${@:-"walker_adapt walker_ilr005 walker_ilr02 walker_seed2 antgoal_adapt antgoal_ilr02 antgoal_T200"}
for name in $NAMES; do
  out="benchmarks/diag/${name}"
  echo "=== ${name} start $(date +%H:%M:%S) ==="
  timeout 3600 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/diag/${name}.json" \
    --dump_path "${out}" > "benchmarks/diag/${name}.out" 2>&1
  echo "=== ${name} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
