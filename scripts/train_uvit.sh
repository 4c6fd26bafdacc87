#!/bin/bash
# Backbone training (reference scripts/train_uvit.sh; parity hyperparameters
# from README: 500k steps / bs 128 / AdamW 2e-4 / 1500 warmup / bf16).
# No CUBLAS determinism pin needed: XLA:TPU compilation is deterministic and
# the trainer threads explicit PRNG keys.

model=uvit
number_of_training_steps=${N_STEPS:-500000}
batch_size=${BATCH_SIZE:-128}
config_path=${CONFIG:-configs/uvit_celeba.yaml}
dataset=${DATASET:-celeba}

python main.py \
    --model $model \
    --n_steps $number_of_training_steps \
    --batch_size $batch_size \
    --use_amp \
    --log_every_n_steps 10000 \
    --save_every_n_steps 10000 \
    --save_new_every_n_steps 50000 \
    --seed 1 \
    --config_path $config_path \
    --parametrization predict_noise \
    --dataset $dataset \
    --resume
