#!/bin/bash
# Round-5 queue #4: PushSimple seed sensitivity on the CURRENT engine.
# The r5 "pushing learns" artifact (seed 1, 400 itr) predates the bf16
# A-assembly precision fix; the same seed+config rerun at 2000 itr on the
# fixed engine is FLAT (SawyerPushSimpleEnv_shaped_2k). Seeds 2/3 check
# whether pushing still learns somewhere in seed space.
set -u
cd /root/repo
run() {
  name=$1; cfg=$2; tmo=$3
  out="benchmarks/validation/${name}"
  echo "=== ${name} start $(date +%H:%M:%S) ==="
  timeout "$tmo" python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/${cfg}.json" \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${name} rc=$? end $(date +%H:%M:%S) ==="
}
run SawyerPushSimpleEnv_shaped_s2 promp_SawyerPushSimpleEnv_shaped_s2 1500
run SawyerPushSimpleEnv_shaped_s3 promp_SawyerPushSimpleEnv_shaped_s3 1500
echo ALL_DONE_R5Q4
