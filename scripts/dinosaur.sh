#!/usr/bin/env bash
# Dinosaur scene reproduction (reference scripts/dinosaur.sh): guidance 7.5.
set -e
DATA="${DATA:-data}/dinosaur"
CKPT="${CKPT:-$(python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --output-dir unedited_models --experiment-name dinosaur | tail -1)}"

edit() {
  python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
    --experiment-name dinosaur --output-dir outputs --data "$DATA" \
    --pipeline.edit_prompt "$1" \
    --pipeline.reverse_prompt "a photo of a dinosaur statue on the road side" \
    --pipeline.guidance_scale 7.5 --pipeline.chunk_size 3 ${2:+--pipeline.langsam_obj "$2"}
}
edit "a photo of a robot dinosaur on the road side" "dinosaur statue"
edit "a photo of a dinosaur statue under the water"
edit "a photo of a dinosaur statue in the snow"
edit "a photo of a dinosaur statue at night"
edit "a photo of a dinosaur statue in the storm"
