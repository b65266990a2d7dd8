#!/bin/bash
# Sequential run over the whole suite with a completed-benchmark checkpoint
# file (reference eval/scripts/run_all_benchmarks.sh:29-60).

set -e
: "${CKPT:?set CKPT}"
CONV_MODE="${CONV_MODE:-llama_3}"
CHUNKS="${CHUNKS:-1}"

BENCHMARKS=(mme gqa scienceqa textvqa pope mmbench_en mmbench_cn seed mmvet \
            mmmu mathvista ai2d chartqa docvqa infovqa stvqa ocrbench mmstar \
            realworldqa synthdog qbench blink mmvp vstar vizwiz ade coco omni)

DONE_FILE="eval_output/$(basename "$CKPT")/completed.txt"
mkdir -p "$(dirname "$DONE_FILE")"
touch "$DONE_FILE"

for BENCH in "${BENCHMARKS[@]}"; do
    if grep -qx "$BENCH" "$DONE_FILE"; then
        echo "skipping completed benchmark: $BENCH"
        continue
    fi
    echo "=== $BENCH ==="
    bash "$(dirname "$0")/run_benchmark.sh" \
        --benchmark "$BENCH" --ckpt "$CKPT" --conv_mode "$CONV_MODE" \
        --chunks "$CHUNKS"
    echo "$BENCH" >> "$DONE_FILE"
done

python -m cambrian_tpu.eval.tabulate \
    --experiment_csv eval_output/experiments.csv \
    --out_long eval_output/all_experiments.csv \
    --out_pivot eval_output/experiments_pivot.csv
