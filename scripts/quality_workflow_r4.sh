#!/bin/bash
# Round-4 textured quality campaign (VERDICT r3 #1/#2/#5/#6): the
# quality_workflow.sh pipeline with (a) a longer-trained generator, (b)
# composition-aware derived cache schedules (DuoDiff late-segment and
# static-exit bucket modes of tools/derive_cache_schedule.py) scored
# against the transferred dense-trajectory table, and (c) the int8
# {dynamic,static} x {uniform,derived} decomposition rows. Artifacts land
# in $WORK; the small JSONs (fd_table, schedules, calibrations) are meant
# to be committed under assets/quality/ afterwards.
set -e
WORK=${WORK:-/tmp/duodiff_textured4}
STEPS=${STEPS:-40000}
DIST=textured
MATRIX_BATCH=${MATRIX_BATCH:-128}

# 1. textured dataset + backbone training + DDPM sampling + mode metrics
python tools/convergence_probe.py --config configs/uvit_cifar10.yaml \
    --steps $STEPS --batch 128 --lr 3e-4 --warmup 100 \
    --distribution $DIST --save_every 10000 \
    --sample_batch 32 --workdir $WORK

BACKBONE=$WORK/logs/conv/cifar10_uvit_last

# 2. DeeDiff probes/heads on the frozen trained backbone
python main.py --model deediff_uvit --config_path configs/deediff_cifar10.yaml \
    --dataset cifar10 --data_path $WORK/data --log_path $WORK/logs \
    --exp_name ee --load_backbone $BACKBONE --freeze_backbone \
    --n_steps 3000 --batch_size 128 --lr 5e-4 --num_warmup_steps 50 \
    --save_every_n_steps 3000 --seed 0
EE=$WORK/logs/ee/cifar10_deediff_uvit_last

# 3. distilled depth-3 shallow model (DuoDiff's early segment, t >= 700)
python main.py --config_path configs/uvit_cifar10_3.yaml \
    --distill_config configs/uvit_cifar10.yaml --distill_from $BACKBONE \
    --distill_alpha 0.7 --distill_t_min 700 \
    --dataset cifar10 --data_path $WORK/data --log_path $WORK/logs \
    --exp_name shallow --n_steps 3000 --batch_size 128 --lr 1e-3 \
    --num_warmup_steps 50 --save_every_n_steps 3000 --seed 0
SHALLOW=$WORK/logs/shallow/cifar10_uvit_last

# 4. static int8 activation scales calibrated against the trained backbone
python tools/calibrate_int8.py --config_path configs/uvit_cifar10.yaml \
    --checkpoint_path $BACKBONE --output $WORK/int8_scales.json \
    --batch_size 16

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

# 7. matrix phase A: everything except the bucket-aware ee row (its
#    schedule needs the ee_dynamic indices from this phase)
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
    --methods ddpm,int8,int8_static,ddim50,dpm20,dpm20_cache3,cache3,cache3_int8,cache3_int8_static,cache5_int8,cache7,cache_derived,cache_derived_int8,cache_derived_int8_static,ee_dynamic,ee_adaptive,ee_adaptive_bidir,ee_static,ee_static_int8,ee_static_cache3,duodiff,duodiff_int8,duodiff_cache3,duodiff_cache_derived_int8 \
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

# 9. all-timestep distilled shallow for the interleaved rows
python main.py --config_path configs/uvit_cifar10_3.yaml \
    --distill_config configs/uvit_cifar10.yaml --distill_from $BACKBONE \
    --distill_alpha 0.7 --distill_t_min 0 \
    --dataset cifar10 --data_path $WORK/data --log_path $WORK/logs \
    --exp_name shallow_all --n_steps 3000 --batch_size 128 --lr 1e-3 \
    --num_warmup_steps 50 --save_every_n_steps 3000 --seed 0
python tools/quality_matrix.py \
    --config configs/uvit_cifar10.yaml --checkpoint $BACKBONE \
    --shallow_config configs/uvit_cifar10_3.yaml \
    --interleave_shallow_checkpoint $WORK/logs/shallow_all/cifar10_uvit_last \
    --distribution $DIST \
    --methods interleave2,interleave4 --batch $MATRIX_BATCH \
    --out $WORK/qm

# 10. FD-rand + spectral scoring of every sampled method
python tools/score_quality.py --out $WORK/qm --distribution $DIST \
    --ref_n 512

cat $WORK/qm/fd_table.json
