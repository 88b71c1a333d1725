#!/usr/bin/env bash
# Face scene reproduction (reference scripts/face.sh): guidance 3 (5 for two
# prompts), langsam_obj 'man'.
set -e
DATA="${DATA:-data}/face"
CKPT="${CKPT:-$(python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --output-dir unedited_models --experiment-name face | tail -1)}"

edit() {
  python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
    --experiment-name face --output-dir outputs --data "$DATA" \
    --pipeline.edit_prompt "$1" \
    --pipeline.reverse_prompt "a photo of a face of a man" \
    --pipeline.guidance_scale "$2" --pipeline.chunk_size 3 \
    --pipeline.langsam_obj "man"
}
edit "a photo of a face of a man with a moustache" 3
edit "a photo of bronze bust statue of a man" 3
edit "a photo of a man wearing a pair of glasses" 3
edit "a photo of a face of a Jocker with green hair" 5
edit "a photo of a face of an old man with wrinkles" 3
edit "a photo of a man wearing a pair of sunglasses" 3
edit "a photo of a face of a woman with thick made-up" 3
edit "a photo of a face of a man with red hair" 5
