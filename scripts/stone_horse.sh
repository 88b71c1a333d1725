#!/usr/bin/env bash
# Stone-horse scene reproduction (reference scripts/stone_horse.sh):
# guidance 5, langsam_obj 'stone horse'.
set -e
DATA="${DATA:-data}/stone_horse"
CKPT="${CKPT:-$(python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --output-dir unedited_models --experiment-name stone_horse | tail -1)}"

edit() {
  python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
    --experiment-name stone_horse --output-dir outputs --data "$DATA" \
    --pipeline.edit_prompt "$1" \
    --pipeline.reverse_prompt "a photo of a stone horse in front of the museum" \
    --pipeline.guidance_scale 5 --pipeline.chunk_size 3 \
    --pipeline.langsam_obj "stone horse"
}
edit "a photo of a giraffe in front of the museum"
edit "a photo of a zebra in front of the museum"
