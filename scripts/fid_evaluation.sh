#!/bin/bash
# FID evaluation of a samples directory against real data
# (reference scripts/fid_evaluation.sh pointed at a script that does not
# exist in the reference tree; this one targets our fid.py CLI).

dataset=${DATASET:-celeba}
samples_path=${SAMPLES:?set SAMPLES to the generated-samples dir}
inception=${INCEPTION_WEIGHTS:-checkpoints/pt_inception-2015-12-05-6726825d.pth}

python fid.py \
    --dataset $dataset \
    --samples_path $samples_path \
    --inception_weights $inception
