#!/bin/bash
# HTTP serving (no reference equivalent; see serve.py docstring).

config_path=${CONFIG:-configs/uvit_celeba.yaml}
checkpoint_path=${CHECKPOINT:?set CHECKPOINT}
port=${PORT:-8861}
method=${METHOD:-dpm}

python serve.py \
    --config_path $config_path \
    --checkpoint_path $checkpoint_path \
    --port $port \
    --method $method
