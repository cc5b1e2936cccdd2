#!/bin/bash
# Round-5 TPU queue #2 (after the bf16-precision fix + spatial fast path):
#   * AntRandDirec seeds 2/3 reruns — the round-4 NaN seeds, expected
#     zero NaN-return iterations and the Adam guard never firing
#   * AntRandDirec2D / HumanoidRandDirec2D coverage curves (VERDICT 9)
#   * SawyerPushEnv with the fixed surface-contact reach gate (VERDICT 3)
#   * KL-gated 5000-iteration Hopper/Walker reruns (VERDICT 4) — long
set -u
cd /root/repo
mkdir -p benchmarks/validation
run() {
  name=$1; cfg=$2; tmo=$3
  out="benchmarks/validation/${name}"
  echo "=== ${name} start $(date +%H:%M:%S) ==="
  timeout "$tmo" python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/${cfg}.json" \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${name} rc=$? end $(date +%H:%M:%S) ==="
}
run AntRandDirecEnv_r5_s2 promp_AntRandDirecEnv_s2 3600
run AntRandDirecEnv_r5_s3 promp_AntRandDirecEnv_s3 3600
run SawyerPushEnv_shaped2_r5 promp_SawyerPushEnv_shaped 5400
run AntRandDirec2DEnv_r5 promp_AntRandDirec2DEnv 3600
run HumanoidRandDirec2DEnv_r5 promp_HumanoidRandDirec2DEnv 5400
run HopperRandParamsEnv_5k_klgate promp_HopperRandParamsEnv_5k_klgate 11000
run Walker2DRandVelEnv_5k_klgate promp_Walker2DRandVelEnv_5k_klgate 11000
echo ALL_DONE_R5Q2
