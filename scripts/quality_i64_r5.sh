#!/bin/bash
# ImageNet-64-geometry textured quality campaign (VERDICT r4 #5): train
# the production uvit_imagenet64 config (D=768, depth 17, 64x64,
# class-conditional) on 64x64 GRF textured data, RE-DERIVE the cache
# schedule ON that trained checkpoint (NOTES round-2: "derive+gate PER
# CHECKPOINT"), and FD-gate dense vs derived(+int8) at the real geometry.
# The committed random-init-derived asset (assets/
# cache_schedule_imagenet64.json) is scored as its own row to record
# whether it transfers to trained weights.
set -e
WORK=${WORK:-/tmp/duodiff_i64}
STEPS=${STEPS:-8000}
N_PER_CLASS=${N_PER_CLASS:-128}   # 4 texture classes -> n=512 per method
CFG=configs/uvit_imagenet64.yaml

# 1. 64x64 textured imagefolder data + backbone training (+ the probe's
#    own per-class sampling/mode metrics)
python tools/convergence_probe.py --config $CFG \
    --dataset imagenet64 --distribution textured \
    --steps $STEPS --batch 128 --lr 3e-4 --warmup 100 \
    --sample_batch 16 --workdir $WORK

CKPT=$WORK/logs/conv/imagenet64_uvit_last

# 2. derive the anchor schedule ON the trained checkpoint (labels drawn
#    from the 4 trained classes only)
python tools/derive_cache_schedule.py --config $CFG \
    --checkpoint $CKPT --label_max 4 --gelu_approx \
    --out $WORK/sched_i64_trained.json

# 3. sampling rows at n=4x$N_PER_CLASS: dense, derived(+int8) on the
#    per-checkpoint schedule, and the committed random-init asset
#    (transfer check)
sample_method () {
    local name=$1; shift
    for k in 0 1 2 3; do
        python sampler.py --config_path $CFG --checkpoint_path $CKPT \
            --parametrization predict_noise --gelu_approx \
            --batch_size $N_PER_CLASS --fixed_class $k --seed $((40 + k)) \
            --output_folder $WORK/qm64/$name/cls$k "$@"
        for f in $WORK/qm64/$name/cls$k/*.png; do
            b=$(basename "$f" .png)
            case "$b" in
                # score_quality counts only all-digit finals; drop grids
                *[!0-9]*) rm -f "$f" ;;
                *) mv "$f" "$WORK/qm64/$name/$((k * N_PER_CLASS + b)).png" ;;
            esac
        done
        rmdir $WORK/qm64/$name/cls$k 2>/dev/null || true
    done
}

sample_method ddpm
sample_method cache_derived --cache_schedule $WORK/sched_i64_trained.json
sample_method cache_derived_int8 \
    --cache_schedule $WORK/sched_i64_trained.json --attn_impl fused_int8
sample_method cache_committed_asset \
    --cache_schedule assets/cache_schedule_imagenet64.json

# 4. FD-rand + spectral scoring vs the 64x64 textured reference
python tools/score_quality.py --out $WORK/qm64 --distribution textured \
    --ref_n 1024

cat $WORK/qm64/fd_table.json
