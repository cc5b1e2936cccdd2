#!/bin/bash
# Round-5 queue #5: E-MAML (TRPO + exploration term) on the Sawyer push
# scenes — the one VERDICT-r4 exploration-gap suggestion not yet tried.
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
run emaml_SawyerPushEnv emaml_SawyerPushEnv 2700
run emaml_SawyerPushSimpleEnv emaml_SawyerPushSimpleEnv 2700
echo ALL_DONE_R5Q5
