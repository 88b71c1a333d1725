#!/usr/bin/env bash
# Garden scene reproduction (reference scripts/garden.sh): guidance 7.5.
set -e
DATA="${DATA:-data}/garden"
CKPT="${CKPT:-$(python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --output-dir unedited_models --experiment-name garden | tail -1)}"

python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
  --experiment-name garden --output-dir outputs --data "$DATA" \
  --pipeline.edit_prompt "a photo of a fake plant on a table in the garden in the snow" \
  --pipeline.reverse_prompt "a photo of a fake plant on a table in the garden" \
  --pipeline.guidance_scale 7.5 --pipeline.chunk_size 3 "$@"
