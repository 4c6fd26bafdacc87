#!/bin/bash
# Early-exit (AdaDiff/DeeDiff) sampling at threshold 0.08
# (reference README.md:104-111).

batch_size=${BATCH_SIZE:-64}
threshold=${THRESHOLD:-0.08}
config_path=${CONFIG:-configs/deediff_celeba.yaml}
checkpoint_path=${CHECKPOINT:?set CHECKPOINT}
output_folder=${OUT:-samples/ee_celeba/}

python eesampler.py \
    --threshold $threshold \
    --batch_size $batch_size \
    --seed 1 \
    --config_path $config_path \
    --checkpoint_path $checkpoint_path \
    --output_folder $output_folder
