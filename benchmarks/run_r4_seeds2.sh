#!/bin/bash
set -u
cd /root/repo
for seed in 2 3; do
  out="benchmarks/validation/AntRandDirecEnv_r4_s${seed}"
  echo "=== ant seed ${seed} start $(date +%H:%M:%S) ==="
  timeout 4000 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/promp_AntRandDirecEnv_s${seed}.json" \
    --n_itr 100 --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ant seed ${seed} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
