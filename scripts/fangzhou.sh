#!/usr/bin/env bash
# Fangzhou scene reproduction (reference scripts/fangzhou.sh): guidance 7.5,
# langsam_obj 'man'.
set -e
DATA="${DATA:-data}/fangzhou"
CKPT="${CKPT:-$(python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --output-dir unedited_models --experiment-name fangzhou | tail -1)}"

edit() {
  python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
    --experiment-name fangzhou --output-dir outputs --data "$DATA" \
    --pipeline.edit_prompt "$1" \
    --pipeline.reverse_prompt "a photo of a face of a man" \
    --pipeline.guidance_scale 7.5 --pipeline.chunk_size 3 \
    --pipeline.langsam_obj "man"
}
edit "a photo of a face of an old man"
edit "a photo of a face of a man with maasai face paint"
edit "a photo of a face of an old lady"
edit "a photo of a face of a man wearing a pair of glasses"
edit "a photo of bronze bust statue of a man"
edit "a photo of a face of a man with chinese opera face paint"
edit "a photo of a face of a newborn baby"
edit "a photo of a face of a woman with thick make-up"
