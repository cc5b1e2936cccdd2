#!/bin/bash
# Learning validation for the non-ProMP algorithms + rand-param envs +
# Sawyer (VERDICT r2 items 2, 3, 8). One at a time: the TPU chip claim is
# exclusive. Each entry = <script>:<config>.
set -u
cd /root/repo
mkdir -p benchmarks/validation
RUNS=${@:-"
maml_run_mujoco:maml_trpo_HalfCheetahRandDirecEnv
e-maml_run_mujoco:emaml_HalfCheetahRandDirecEnv
pro-mp_run_point_mass:vpg_maml_MetaPointEnvCorner
pro-mp_run_point_mass:dice_maml_MetaPointEnvCorner
pro-mp_run_mujoco:promp_Walker2DRandParamsEnv
pro-mp_run_mujoco:promp_HopperRandParamsEnv
pro-mp_run_mujoco:promp_SawyerPushEnv
"}
for run in $RUNS; do
  script="${run%%:*}"; cfg="${run##*:}"
  out="benchmarks/validation/${cfg}"
  echo "=== ${cfg} start $(date +%H:%M:%S) ==="
  timeout 5400 python "run_scripts/${script}.py" \
    --config_file "benchmarks/configs/${cfg}.json" \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${cfg} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
