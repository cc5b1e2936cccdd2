#!/bin/bash
# Sequential ProMP learning-validation runs on the reference mujoco-class
# configs (VERDICT round-1 item 1). One at a time: the TPU chip claim is
# exclusive. Each run under its own timeout. Pass env names to re-run a
# subset, e.g.:  bash benchmarks/run_validation.sh AntRandGoalEnv
set -u
cd /root/repo
mkdir -p benchmarks/validation
ENVS=${@:-"SwimmerRandVelEnv Walker2DRandVelEnv AntRandGoalEnv HumanoidRandDirecEnv"}
for name in $ENVS; do
  out="benchmarks/validation/${name}"
  echo "=== ${name} start $(date +%H:%M:%S) ==="
  timeout 7200 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/promp_${name}.json" \
    --dump_path "${out}" > "benchmarks/validation/${name}.out" 2>&1
  echo "=== ${name} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
