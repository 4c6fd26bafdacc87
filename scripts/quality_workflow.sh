#!/bin/bash
# Reproduce the README "Does it learn?" + quality-vs-speed table end to end
# on one TPU chip (the exact sequence run on 2026-08-17/18; ~1.5 h total,
# dominated by first-compiles). Every stage goes through the production
# CLIs. WORK defaults to /tmp/duodiff_quality.
#
# DIST=textured runs the same pipeline on the textured synthetic benchmark
# (Gaussian random fields with class-distinct power-law spectra) instead of
# the solid palettes; step 7 then scores every method with FD-rand + the
# radial-spectrum distance (tools/score_quality.py).
set -e
WORK=${WORK:-/tmp/duodiff_quality}
STEPS=${STEPS:-12000}
DIST=${DIST:-palette}
# matrix sample count per method: 32 reproduces the round-2 table quickly;
# 128 is the validated FD-rand operating point (Frechet estimates over 2048-d
# features need every sample they can get — see tools/score_quality.py)
MATRIX_BATCH=${MATRIX_BATCH:-32}

# 1. synthetic dataset + backbone training + DDPM sampling + metrics
python tools/convergence_probe.py --config configs/uvit_cifar10.yaml \
    --steps $STEPS --batch 128 --lr 3e-4 --warmup 100 \
    --distribution $DIST \
    --sample_batch 32 --workdir $WORK

BACKBONE=$WORK/logs/conv/cifar10_uvit_last

# 2. DeeDiff probes/heads on the frozen trained backbone
python main.py --model deediff_uvit --config_path configs/deediff_cifar10.yaml \
    --dataset cifar10 --data_path $WORK/data --log_path $WORK/logs \
    --exp_name ee --load_backbone $BACKBONE --freeze_backbone \
    --n_steps 3000 --batch_size 128 --lr 5e-4 --num_warmup_steps 50 \
    --save_every_n_steps 3000 --seed 0

# 3. distilled depth-3 shallow model (DuoDiff's early segment, t >= 700)
python main.py --config_path configs/uvit_cifar10_3.yaml \
    --distill_config configs/uvit_cifar10.yaml --distill_from $BACKBONE \
    --distill_alpha 0.7 --distill_t_min 700 \
    --dataset cifar10 --data_path $WORK/data --log_path $WORK/logs \
    --exp_name shallow --n_steps 3000 --batch_size 128 --lr 1e-3 \
    --num_warmup_steps 50 --save_every_n_steps 3000 --seed 0

# 4. static int8 activation scales calibrated against the trained backbone
#    (feeds the int8_static quality row + --int8_scales serving)
python tools/calibrate_int8.py --config_path configs/uvit_cifar10.yaml \
    --checkpoint_path $BACKBONE --output $WORK/int8_scales.json \
    --batch_size 16

# 5. the full matrix: DDPM/DDIM/DPM + dynamic & (median-derived) static
#    early exit + DuoDiff, each scored against the synthetic distribution
python tools/quality_matrix.py \
    --config configs/uvit_cifar10.yaml --checkpoint $BACKBONE \
    --ee_config configs/deediff_cifar10.yaml \
    --ee_checkpoint $WORK/logs/ee/cifar10_deediff_uvit_last \
    --shallow_config configs/uvit_cifar10_3.yaml \
    --shallow_checkpoint $WORK/logs/shallow/cifar10_uvit_last \
    --int8_scales $WORK/int8_scales.json \
    --distribution $DIST \
    --t_switch 300 --palette_k 4 --batch $MATRIX_BATCH --out $WORK/qm

cat $WORK/qm/quality_matrix.json

# 6. all-timestep distilled shallow for the interleaved rows
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
    --methods interleave2,interleave4 --palette_k 4 --batch $MATRIX_BATCH \
    --out $WORK/qm

# 7. FD-rand + spectral scoring of every sampled method (the falsifiable
#    quality table: fd_table.json, ranked by fd_rand_vs_dense)
python tools/score_quality.py --out $WORK/qm --distribution $DIST \
    --ref_n 512

cat $WORK/qm/fd_table.json
