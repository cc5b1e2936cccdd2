#!/bin/bash
# Long adaptation runs for the envs whose round-2 curves were flat
# (VERDICT r2 item 1), using the round-3 diagnosis recipe
# (adaptive_inner_kl_penalty=True keeps the inner step at the 0.01 KL
# target instead of withering). One at a time: exclusive TPU claim.
set -u
cd /root/repo
mkdir -p benchmarks/validation
RUNS=${@:-"
promp_AntRandGoalEnv_long
promp_Walker2DRandVelEnv_long
"}
for cfg in $RUNS; do
  out="benchmarks/validation/${cfg#promp_}"
  echo "=== ${cfg} start $(date +%H:%M:%S) ==="
  timeout 7000 python run_scripts/pro-mp_run_mujoco.py \
    --config_file "benchmarks/configs/${cfg}.json" \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${cfg} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
