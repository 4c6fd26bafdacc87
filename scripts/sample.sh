#!/bin/bash
# Dense sampling (reference scripts/sample.sh).

batch_size=${BATCH_SIZE:-64}
config_path=${CONFIG:-configs/uvit_celeba.yaml}
checkpoint_path=${CHECKPOINT:?set CHECKPOINT}
output_folder=${OUT:-samples/celeba/}

python sampler.py \
    --parametrization predict_noise \
    --batch_size $batch_size \
    --seed 1 \
    --config_path $config_path \
    --checkpoint_path $checkpoint_path \
    --output_folder $output_folder
