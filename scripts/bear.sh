#!/usr/bin/env bash
# Bear scene reproduction (reference scripts/bear.sh): pre-train 30k, then the
# paper's bear edits at guidance 5, langsam_obj 'bear'.
set -e
DATA="${DATA:-data}/bear"
CKPT="${CKPT:-$(python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --output-dir unedited_models --experiment-name bear | tail -1)}"

for PROMPT in \
  "a photo of a polar bear in the forest" \
  "a photo of a grizzly bear in the forest" \
  "a photo of a golden bear statue in the forest"; do
  python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
    --experiment-name bear --output-dir outputs --data "$DATA" \
    --pipeline.edit_prompt "$PROMPT" \
    --pipeline.reverse_prompt "a photo of a bear statue in the forest" \
    --pipeline.guidance_scale 5 --pipeline.chunk_size 3 \
    --pipeline.langsam_obj "bear" "$@"
done
