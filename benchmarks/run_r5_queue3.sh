#!/bin/bash
# Round-5 TPU queue #3 (post-verdict continuation):
#   * SawyerPushEnv shaped at 3000 iterations — does the full push env's
#     placeDist keep decreasing past the 400-itr budget (where it sat at
#     0.147 -> 0.133)?
#   * SawyerPushSimpleEnv shaped at 2000 iterations — push the
#     demonstrated pushing signal (0.171 -> 0.105 post) further
#   * HumanoidRandDirec2D at 600 iterations — the 100-itr curve was flat;
#     2.8 s/itr now makes a 6x budget cheap
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
run SawyerPushEnv_shaped_3k promp_SawyerPushEnv_shaped_3k 3600
run SawyerPushSimpleEnv_shaped_2k promp_SawyerPushSimpleEnv_shaped_2k 2400
run HumanoidRandDirec2DEnv_600 promp_HumanoidRandDirec2DEnv_600 3600
echo ALL_DONE_R5Q3
