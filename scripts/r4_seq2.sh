#!/usr/bin/env bash
# Round-4 chip sequence, part 2 — the tail of r4_chip_sequence.sh that was
# cut when the session restarted: CLIP-protocol evals on both converged-scene
# e2e runs (correct nested path this time), then the perf_r4_ab matrix.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/r4_seq outputs/perf_r4

for RUN in outputs/bear_r4/gaussctrl/gaussctrl/2026-*; do
  [ -d "$RUN" ] || continue
  echo "=== eval $RUN ===" | tee -a outputs/r4_seq/seq.log
  timeout 1200 python -m gaussctrl_tpu.cli.eval --run "$RUN" \
    > "outputs/r4_seq/eval_$(basename "$RUN").log" 2>&1
  echo "eval exit=$?" | tee -a outputs/r4_seq/seq.log
done

echo "=== perf_r4_ab ===" | tee -a outputs/r4_seq/seq.log
timeout 7200 python scripts/perf_r4_ab.py > outputs/perf_r4/ab.txt 2>&1
echo "ab exit=$?" | tee -a outputs/r4_seq/seq.log
echo "=== r4_seq2 done ===" | tee -a outputs/r4_seq/seq.log
