#!/bin/bash
# VERDICT r3 item 2: VPG_DICEMAML with the return_baseline GAE outer
# advantages (the reference's variance-reduced DICE configuration,
# dice_sample_processor.py:199-236) on dense point-mass corner, inner_lr
# sweep. Runs on CPU (JAX_PLATFORMS=cpu) so the TPU claim stays free.
set -u
cd /root/repo
mkdir -p benchmarks/validation
RUNS=${@:-"
vpg_dice_MetaPointEnvCorner_dense_rb_ilr001
vpg_dice_MetaPointEnvCorner_dense_rb_ilr01
vpg_dice_MetaPointEnvCorner_dense_rb_ilr05
"}
for cfg in $RUNS; do
  out="benchmarks/validation/${cfg}"
  echo "=== ${cfg} start $(date +%H:%M:%S) ==="
  JAX_PLATFORMS=cpu timeout 3600 python run_scripts/pro-mp_run_point_mass.py \
    --config_file "benchmarks/configs/${cfg}.json" \
    --dump_path "${out}" > "${out}.out" 2>&1
  echo "=== ${cfg} rc=$? end $(date +%H:%M:%S) ==="
done
echo ALL_DONE
