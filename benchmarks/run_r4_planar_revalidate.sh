#!/bin/bash
set -u
cd /root/repo
run() {
  local cfg=$1 out=$2 extra=${3:-}
  echo "=== ${out} start $(date +%H:%M:%S) ==="
  timeout 5400 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/${cfg}.json" --n_itr 100 \
    --dump_path "benchmarks/validation/${out}" \
    > "benchmarks/validation/${out}.out" 2>&1
  echo "=== ${out} rc=$? end $(date +%H:%M:%S) ==="
}
run promp_HalfCheetahRandVelEnv HalfCheetahRandVelEnv_r4p
run promp_Walker2DRandVelEnv Walker2DRandVelEnv_r4p
run promp_HopperRandParamsEnv_adapt HopperRandParamsEnv_r4p
run promp_HumanoidRandDirecEnv HumanoidRandDirecEnv_r4
echo ALL_DONE
