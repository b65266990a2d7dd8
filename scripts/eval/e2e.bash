#!/bin/bash
# End-to-end: consolidate a training checkpoint -> HF export -> run the full
# benchmark suite -> tabulate (reference eval/scripts/e2e.bash pipeline).
set -e
: "${CKPT_DIR:?training output dir (contains orbax/)}"

HF_DIR="${HF_DIR:-${CKPT_DIR}/hf}"
python -m cambrian_tpu.checkpoint.consolidate \
    --ckpt_dir "$CKPT_DIR" --output_dir "$HF_DIR"

CKPT="$HF_DIR" CONV_MODE="${CONV_MODE:-llama_3}" CHUNKS="${CHUNKS:-1}" \
    bash "$(dirname "$0")/run_all_benchmarks.sh"
