#!/bin/bash
# DuoDiff dual-backbone sampling: shallow model for the first t_switch
# (high-noise) steps, full model after (reference README.md:114-125,
# t_switch=300 with a depth-3 shallow model).

batch_size=${BATCH_SIZE:-64}
t_switch=${T_SWITCH:-300}
config_early=${CONFIG_EARLY:-configs/uvit_celeba_3.yaml}
config_late=${CONFIG_LATE:-configs/uvit_celeba.yaml}
ckpt_early=${CHECKPOINT_EARLY:?set CHECKPOINT_EARLY (shallow model)}
ckpt_late=${CHECKPOINT_LATE:?set CHECKPOINT_LATE (full model)}
output_folder=${OUT:-samples/duodiff_celeba/}

python sampler.py \
    --parametrization predict_noise \
    --batch_size $batch_size \
    --seed 1 \
    --config_path $config_early \
    --checkpoint_path $ckpt_early \
    --config_path_late $config_late \
    --checkpoint_path_late $ckpt_late \
    --t_switch $t_switch \
    --output_folder $output_folder
