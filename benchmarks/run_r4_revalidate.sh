#!/bin/bash
# Round-4 engine revalidation: re-run the short ProMP validation configs
# on the unrolled-solver engine — refreshes the ItrTime table AND
# demonstrates learning is intact after the solver change.
set -u
cd /root/repo
for name in HalfCheetahRandVelEnv AntRandDirecEnv SwimmerRandVelEnv Walker2DRandVelEnv HumanoidRandDirecEnv AntRandGoalEnv; do
  out="benchmarks/validation/${name}_r4"
  echo "=== ${name}_r4 start $(date +%H:%M:%S) ==="
  timeout 5400 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/promp_${name}.json" \
    --n_itr 100 \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${name}_r4 rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
