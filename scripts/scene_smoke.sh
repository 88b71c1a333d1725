#!/usr/bin/env bash
# Per-scene smoke (VERDICT r4 #8): prove the per-scene config matrix beyond
# bear and face. Mirrors the reference's per-scene scripts
# (/root/reference/scripts/{garden,dinosaur,fangzhou,stone_horse}.sh):
# each scene pairs a SHORT pretrain (chip budget, honestly labeled
# mid-training) with one representative edit at the reference's prompts,
# guidance, and langsam object.
#
#   SCENE=dinosaur STEPS=2000 scripts/scene_smoke.sh [extra edit flags]
set -e
cd "$(dirname "$0")/.."
SCENE="${SCENE:-dinosaur}"
DATA="${DATA:-/root/reference/data/$SCENE}"
STEPS="${STEPS:-2000}"
OUT="${OUT:-outputs/${SCENE}_r5}"

case "$SCENE" in
  garden)      # garden.sh: no langsam obj (whole-scene edit), guidance 7.5
    EDIT="a photo of a fake plant on a table in the garden in the snow"
    REV="a photo of a fake plant on a table in the garden"
    GUIDE=7.5; OBJ="" ;;
  dinosaur)    # dinosaur.sh edit #1: masked edit, guidance 7.5
    EDIT="a photo of a robot dinosaur on the road side"
    REV="a photo of a dinosaur statue on the road side"
    GUIDE=7.5; OBJ="dinosaur statue" ;;
  fangzhou)    # fangzhou.sh edit #1: portrait, guidance 7.5
    EDIT="a photo of a face of an old man"
    REV="a photo of a face of a man"
    GUIDE=7.5; OBJ="man" ;;
  stone_horse) # stone_horse.sh edit #2: masked edit, guidance 5
    EDIT="a photo of a zebra in front of the museum"
    REV="a photo of a stone horse in front of the museum"
    GUIDE=5; OBJ="stone horse" ;;
  *) echo "unknown SCENE=$SCENE (garden|dinosaur|fangzhou|stone_horse)"; exit 2 ;;
esac

python -m gaussctrl_tpu.cli.splat_train --data "$DATA" \
  --raster.isect_divisor 4 --raster.large_divisor 32 \
  --trainer.num_steps "$STEPS" --trainer.ckpt_every 1000 \
  --output-dir "$OUT" --experiment-name splat
CKPT=$(ls "$OUT"/splat/splat/*/ckpts/step-*[0-9].npz | sort | tail -1)
echo "pretrained: $CKPT"

ARGS=(--load-checkpoint "$CKPT" --experiment-name gaussctrl
      --output-dir "$OUT" --data "$DATA"
      --pipeline.edit_prompt "$EDIT" --pipeline.reverse_prompt "$REV"
      --pipeline.guidance_scale "$GUIDE" --pipeline.chunk_size 0)
[ -n "$OBJ" ] && ARGS+=(--pipeline.langsam_obj "$OBJ")
python -m gaussctrl_tpu.cli.train "${ARGS[@]}" "$@"
