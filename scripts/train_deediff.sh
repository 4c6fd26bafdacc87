#!/bin/bash
# DeeDiff probe/head fine-tuning on a frozen backbone
# (reference scripts/train_deediff.sh; 100k steps frozen-backbone).

model=deediff_uvit
number_of_training_steps=${N_STEPS:-100000}
batch_size=${BATCH_SIZE:-128}
config_path=${CONFIG:-configs/deediff_celeba.yaml}
dataset=${DATASET:-celeba}
backbone=${BACKBONE:?set BACKBONE to the pretrained UViT checkpoint}

python main.py \
    --model $model \
    --n_steps $number_of_training_steps \
    --batch_size $batch_size \
    --use_amp \
    --log_every_n_steps 10000 \
    --save_every_n_steps 10000 \
    --seed 1 \
    --config_path $config_path \
    --parametrization predict_noise \
    --dataset $dataset \
    --load_backbone $backbone \
    --freeze_backbone
