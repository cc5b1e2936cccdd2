#!/bin/bash
set -u
cd /root/repo
echo "=== sawyer2k start $(date +%H:%M:%S) ==="
timeout 7000 python run_scripts/pro-mp_run_mujoco.py \
  --config_file benchmarks/configs/promp_SawyerPushEnv_2k.json \
  --dump_path benchmarks/validation/SawyerPushEnv_2k \
  > benchmarks/validation/SawyerPushEnv_2k.out 2>&1
echo "=== sawyer2k rc=$? end $(date +%H:%M:%S) ==="
echo ALL_DONE
