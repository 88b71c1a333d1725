#!/usr/bin/env bash
# Multi-scene smoke (VERDICT r3 #8): prove the pipeline is not bear-shaped.
# The face scene differs from bear in every data-path dimension: 65 views
# (subset_num*sampled_views_every_subset picks 40 of 65 instead of 40 of 96),
# portrait intrinsics, langsam_obj "man", and guidance 3 for most prompts
# (reference scripts/face.sh).
#
# Chip budget is the constraint, not the method: a SHORT pretrain (default
# 2000 steps) stands in for the 30k protocol — the edit pipeline is identical
# from that point on; outputs are honestly labeled mid-training.
set -e
cd "$(dirname "$0")/.."
DATA="${DATA:-/root/reference/data/face}"
STEPS="${STEPS:-2000}"
OUT="${OUT:-outputs/face_r4}"

python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --trainer.num_steps "$STEPS" --trainer.ckpt_every 1000 \
  --output-dir "$OUT" --experiment-name splat
# newest f32 checkpoint of the run just finished (stdout's last line is the
# final-renders path, not the checkpoint — don't parse it)
CKPT=$(ls "$OUT"/splat/splat/*/ckpts/step-*[0-9].npz | sort | tail -1)
echo "pretrained: $CKPT"

python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
  --experiment-name gaussctrl --output-dir "$OUT" --data "$DATA" \
  --pipeline.edit_prompt "a photo of a face of a man with a moustache" \
  --pipeline.reverse_prompt "a photo of a face of a man" \
  --pipeline.guidance_scale 3 --pipeline.chunk_size 0 \
  --pipeline.langsam_obj "man" "$@"
