#!/bin/bash
# Round-5 textured quality campaign (VERDICT r4 #2/#3/#4/#7): the r4
# pipeline with (a) REAL auxiliary training budgets — DeeDiff probes 20k
# steps (r4: 3k) and the depth-3 distilled shallow 40k steps with
# intermediate checkpoints for a distillation-budget curve, (b) the int8
# static-scale CLIP SEARCH (tools/calibrate_int8.py --mode search:
# percentile-clip candidates PSNR-scored against the deployed dynamic
# kernels) replacing raw amax*1.1, and (c) every FD gate re-scored at
# n=512 method samples (r4: 128) with ref_n=1024. Artifacts land in
# $WORK; the small JSONs are committed under assets/quality/ afterwards.
set -e
WORK=${WORK:-/tmp/duodiff_textured5}
STEPS=${STEPS:-40000}
DIST=textured
MATRIX_BATCH=${MATRIX_BATCH:-512}
EE_STEPS=${EE_STEPS:-20000}
SHALLOW_STEPS=${SHALLOW_STEPS:-40000}

# 1. textured dataset + backbone training + DDPM sampling + mode metrics
python tools/convergence_probe.py --config configs/uvit_cifar10.yaml \
    --steps $STEPS --batch 128 --lr 3e-4 --warmup 100 \
    --distribution $DIST --save_every 10000 \
    --sample_batch 32 --workdir $WORK

BACKBONE=$WORK/logs/conv/cifar10_uvit_last

# 2. DeeDiff probes/heads on the frozen trained backbone — 20k steps
#    (r4's 3k was the suspected cause of the ee family's weak quality;
#    reference budget is 100k, /root/reference/README.md:49-70)
python main.py --model deediff_uvit --config_path configs/deediff_cifar10.yaml \
    --dataset cifar10 --data_path $WORK/data --log_path $WORK/logs \
    --exp_name ee --load_backbone $BACKBONE --freeze_backbone \
    --n_steps $EE_STEPS --batch_size 128 --lr 5e-4 --num_warmup_steps 200 \
    --save_every_n_steps 5000 --seed 0
EE=$WORK/logs/ee/cifar10_deediff_uvit_last

# 3. distilled depth-3 shallow model (DuoDiff's early segment, t >= 700)
#    40k steps, checkpointed every 10k for the budget curve
python main.py --config_path configs/uvit_cifar10_3.yaml \
    --distill_config configs/uvit_cifar10.yaml --distill_from $BACKBONE \
    --distill_alpha 0.7 --distill_t_min 700 \
    --dataset cifar10 --data_path $WORK/data --log_path $WORK/logs \
    --exp_name shallow --n_steps $SHALLOW_STEPS --batch_size 128 --lr 1e-3 \
    --num_warmup_steps 200 --save_every_n_steps 10000 \
    --save_new_every_n_steps 10000 --seed 0
SHALLOW=$WORK/logs/shallow/cifar10_uvit_last

# 4. int8 static activation scales: clip-scale SEARCH against the
#    deployed dynamic kernels (VERDICT r4 #3 — raw amax*1.1 scored
#    fd ~20-21 vs dynamic's 2.4-5.2; percentile clips are the standard
#    fix for amax outlier sensitivity)
python tools/calibrate_int8.py --config_path configs/uvit_cifar10.yaml \
    --checkpoint_path $BACKBONE --output $WORK/int8_scales.json \
    --report $WORK/int8_search.json --mode search \
    --search_grid 99.5,99.9,99.99 --batch_size 16

# 5. derived cache schedules ON the scoring checkpoint (not transferred):
#    plain dense-trajectory table + the DuoDiff late-segment mode
python tools/derive_cache_schedule.py --config configs/uvit_cifar10.yaml \
    --checkpoint $BACKBONE --out $WORK/sched_plain.json
python tools/derive_cache_schedule.py --config configs/uvit_cifar10.yaml \
    --checkpoint $BACKBONE --t_switch 300 \
    --shallow_config configs/uvit_cifar10_3.yaml \
    --shallow_checkpoint $SHALLOW --out $WORK/sched_duodiff.json

# 6. probe calibration for the bidirectional adaptive-exit row
python tools/calibrate_probes.py --config configs/deediff_cifar10.yaml \
    --checkpoint $EE --out $WORK/probe_calibration.json --batch 32

# 7. matrix phase A at n=512 (VERDICT r4 #4: every gate decision at
#    defensible sample counts)
python tools/quality_matrix.py \
    --config configs/uvit_cifar10.yaml --checkpoint $BACKBONE \
    --ee_config configs/deediff_cifar10.yaml --ee_checkpoint $EE \
    --shallow_config configs/uvit_cifar10_3.yaml \
    --shallow_checkpoint $SHALLOW \
    --int8_scales $WORK/int8_scales.json \
    --cache_schedule $WORK/sched_plain.json \
    --cache_schedule_duodiff $WORK/sched_duodiff.json \
    --probe_calibration $WORK/probe_calibration.json \
    --distribution $DIST \
    --methods ddpm,int8,int8_static,ddim50,dpm20,cache3_int8,cache_derived_int8,cache_derived_int8_static,ee_dynamic,ee_adaptive,ee_adaptive_bidir,ee_static,ee_static_int8,duodiff,duodiff_int8,duodiff_cache_derived_int8 \
    --t_switch 300 --batch $MATRIX_BATCH --out $WORK/qm

# 8. bucket-aware static-exit schedule from the measured exit buckets,
#    then matrix phase B (the composed row it unlocks)
BUCKETS=$(python - "$WORK/qm/ee_dynamic/indices_by_timestep.npy" <<'EOF'
import sys

import numpy as np

from duodiff_tpu.diffusion.static_exit import derive_exit_schedule

b = derive_exit_schedule(np.load(sys.argv[1]), n_buckets=4, quantile=0.5)
print(",".join(f"{hi}-{lo}:{layer}" for hi, lo, layer in b))
EOF
)
echo "derived exit buckets: $BUCKETS"
python tools/derive_cache_schedule.py --config configs/deediff_cifar10.yaml \
    --checkpoint $EE --static_schedule "$BUCKETS" \
    --out $WORK/sched_ee.json
python tools/quality_matrix.py \
    --config configs/uvit_cifar10.yaml --checkpoint $BACKBONE \
    --ee_config configs/deediff_cifar10.yaml --ee_checkpoint $EE \
    --cache_schedule_ee $WORK/sched_ee.json \
    --distribution $DIST \
    --methods ee_static_cache_derived_int8 \
    --batch $MATRIX_BATCH --out $WORK/qm

# 9. distillation-budget curve: the plain duodiff row at each shallow
#     checkpoint (shares the phase-A dense/ddpm reference samples)
for N in 10000 20000 30000; do
    CK=$WORK/logs/shallow/cifar10_uvit_step-$N
    [ -d "$CK" ] || continue
    D=$WORK/qm_curve/$N
    mkdir -p $D
    ln -sfn $WORK/qm/ddpm $D/ddpm
    python tools/quality_matrix.py \
        --config configs/uvit_cifar10.yaml --checkpoint $BACKBONE \
        --shallow_config configs/uvit_cifar10_3.yaml \
        --shallow_checkpoint $CK \
        --distribution $DIST \
        --methods duodiff --t_switch 300 --batch $MATRIX_BATCH --out $D
    python tools/score_quality.py --out $D --distribution $DIST \
        --ref_n 1024 --methods duodiff
done

# 10. FD-rand + spectral scoring of every sampled method at ref_n=1024
python tools/score_quality.py --out $WORK/qm --distribution $DIST \
    --ref_n 1024

cat $WORK/qm/fd_table.json
