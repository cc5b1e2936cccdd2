#!/bin/bash
# Round-5 validation queue #1 (TPU-exclusive; one run at a time).
#   * VERDICT item 9: curves for registered envs that had none
#     (MetaPointEnvWalls, MetaPointEnvMomentum, SawyerDoor, SawyerPick)
#   * VERDICT item 7: num_inner_grad_steps=2 and trainable_inner_step_size
#   * VERDICT item 3: shaped-reward Sawyer push (+ push-simple)
# Engine-independent of the ant/humanoid round-5 changes, so these can run
# while that work continues.
set -u
cd /root/repo
mkdir -p benchmarks/validation
RUNS=${@:-"promp_MetaPointEnvWalls promp_MetaPointEnvMomentum \
  promp_HalfCheetahRandVelEnv_inner2 promp_HalfCheetahRandVelEnv_trainlr \
  promp_SawyerPushEnv_shaped promp_SawyerPushSimpleEnv_shaped \
  promp_SawyerDoorEnv promp_SawyerPickAndPlaceEnv"}
for name in $RUNS; do
  out="benchmarks/validation/${name#promp_}_r5"
  echo "=== ${name} start $(date +%H:%M:%S) ==="
  timeout 5400 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/${name}.json" \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${name} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE_R5Q1
