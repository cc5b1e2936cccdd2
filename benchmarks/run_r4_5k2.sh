#!/bin/bash
set -u
cd /root/repo
echo "=== walker5k_v2 start $(date +%H:%M:%S) ==="
timeout 6000 python run_scripts/pro-mp_run_mujoco.py \
  --config_file benchmarks/configs/promp_Walker2DRandVelEnv_5k.json \
  --dump_path benchmarks/validation/Walker2DRandVelEnv_5k_v2 \
  > benchmarks/validation/Walker2DRandVelEnv_5k_v2.out 2>&1
echo "=== walker5k_v2 rc=$? end $(date +%H:%M:%S) ==="
echo "=== sawyer_wide start $(date +%H:%M:%S) ==="
timeout 6000 python run_scripts/pro-mp_run_mujoco.py \
  --config_file benchmarks/configs/promp_SawyerPushEnv_wide.json \
  --dump_path benchmarks/validation/SawyerPushEnv_wide \
  > benchmarks/validation/SawyerPushEnv_wide.out 2>&1
echo "=== sawyer_wide rc=$? end $(date +%H:%M:%S) ==="
echo ALL_DONE
