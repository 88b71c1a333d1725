#!/usr/bin/env bash
# Round-4 chip sequence — runs unattended once the 30k pretrain frees the chip.
#   1. wait for pretrain (pid file) AND the archive committer to exit
#   2. e2e bear edit off the CONVERGED step-30000 scene, chunk0 + chunk3
#   3. CLIP-protocol eval on both runs (self-labeled weight provenance)
#   4. perf_r4_ab.py attention/batching A/B (sets the bench.py routing)
# Each phase logs under outputs/r4_seq/.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/r4_seq

wait_pid() {
  local pid="$1"
  while kill -0 "$pid" 2>/dev/null; do sleep 20; done
}

if [ -f /tmp/pretrain.pid ]; then wait_pid "$(cat /tmp/pretrain.pid)"; fi
if [ -f /tmp/committer.pid ]; then wait_pid "$(cat /tmp/committer.pid)"; fi
sleep 5

CKPT=$(ls outputs/bear_r4/splat/splat/*/ckpts/step-000030000.npz 2>/dev/null | tail -1)
if [ -z "$CKPT" ]; then
  # fall back to the newest f32 checkpoint if 30k didn't complete
  CKPT=$(ls outputs/bear_r4/splat/splat/*/ckpts/step-*[0-9].npz 2>/dev/null | sort | tail -1)
fi
echo "=== r4_seq: editing off $CKPT ===" | tee outputs/r4_seq/seq.log

for CHUNK in 0 3; do
  echo "=== e2e chunk_size=$CHUNK ===" | tee -a outputs/r4_seq/seq.log
  timeout 2400 python -m gaussctrl_tpu.cli.train --load-checkpoint "$CKPT" \
    --experiment-name gaussctrl --output-dir outputs/bear_r4 \
    --data /root/reference/data/bear \
    --pipeline.edit_prompt "a photo of a polar bear in the forest" \
    --pipeline.reverse_prompt "a photo of a bear statue in the forest" \
    --pipeline.guidance_scale 5 --pipeline.chunk_size "$CHUNK" \
    --pipeline.langsam_obj "bear" \
    > "outputs/r4_seq/e2e_chunk$CHUNK.log" 2>&1
  echo "chunk$CHUNK exit=$?" | tee -a outputs/r4_seq/seq.log
done

for RUN in outputs/bear_r4/gaussctrl/2026-*; do
  [ -d "$RUN" ] || continue
  echo "=== eval $RUN ===" | tee -a outputs/r4_seq/seq.log
  timeout 1200 python -m gaussctrl_tpu.cli.eval --run "$RUN" \
    > "outputs/r4_seq/eval_$(basename "$RUN").log" 2>&1
  echo "eval exit=$?" | tee -a outputs/r4_seq/seq.log
done

echo "=== perf_r4_ab ===" | tee -a outputs/r4_seq/seq.log
mkdir -p outputs/perf_r4
timeout 5400 python scripts/perf_r4_ab.py > outputs/perf_r4/ab.txt 2>&1
echo "ab exit=$?" | tee -a outputs/r4_seq/seq.log
echo "=== r4_seq done ===" | tee -a outputs/r4_seq/seq.log
