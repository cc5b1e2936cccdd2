#!/bin/bash
set -u
cd /root/repo
for name in Walker2DRandVelEnv HopperRandParamsEnv; do
  out="benchmarks/validation/${name}_5k"
  echo "=== ${name}_5k start $(date +%H:%M:%S) ==="
  timeout 6000 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/promp_${name}_5k.json" \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${name}_5k rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
