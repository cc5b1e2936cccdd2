#!/bin/bash
# Round-4 TPU long-run queue (VERDICT r3 items 4, 6, 8). One at a time:
# exclusive TPU claim. Each entry = <script>:<config>:<outdir>.
set -u
cd /root/repo
mkdir -p benchmarks/validation
RUNS="
e-maml_run_mujoco:emaml_HalfCheetahRandDirecEnv:emaml_HalfCheetahRandDirecEnv_r4
pro-mp_run_mujoco:promp_HopperRandParamsEnv_long:HopperRandParamsEnv_long
pro-mp_run_mujoco:promp_SawyerPushEnv_long:SawyerPushEnv_long
"
for run in $RUNS; do
  script="${run%%:*}"; rest="${run#*:}"; cfg="${rest%%:*}"; out="${rest##*:}"
  echo "=== ${cfg} start $(date +%H:%M:%S) ==="
  timeout 7000 python "run_scripts/${script}.py" \
    --config_file "benchmarks/configs/${cfg}.json" \
    --dump_path "benchmarks/validation/${out}" \
    > "benchmarks/validation/${out}.out" 2>&1
  echo "=== ${cfg} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
