#!/bin/bash
# Chunked benchmark run (reference eval/scripts/run_benchmark.sh): fork one
# runner per chunk, concatenate answer files, score, append to the shared
# experiments CSV.
#
# Usage: bash scripts/eval/run_benchmark.sh --benchmark mmmu --ckpt PATH \
#            --conv_mode llama_3 [--chunks N] [--dataset_path P]

set -e

CHUNKS=1
CONV_MODE=llama_3
DATASET_PATH=""
while [[ $# -gt 0 ]]; do
    case "$1" in
        --benchmark) BENCHMARK="$2"; shift 2;;
        --ckpt) CKPT="$2"; shift 2;;
        --conv_mode) CONV_MODE="$2"; shift 2;;
        --chunks) CHUNKS="$2"; shift 2;;
        --dataset_path) DATASET_PATH="$2"; shift 2;;
        *) echo "unknown arg $1"; exit 1;;
    esac
done

: "${BENCHMARK:?--benchmark required}"
: "${CKPT:?--ckpt required}"

MODEL_ID=$(basename "$CKPT")
OUT_DIR="eval_output/${MODEL_ID}/${BENCHMARK}"
mkdir -p "$OUT_DIR"

DATASET_ARG=""
if [[ -n "$DATASET_PATH" ]]; then DATASET_ARG="--dataset_path $DATASET_PATH"; fi

for ((IDX = 0; IDX < CHUNKS; IDX++)); do
    python -m cambrian_tpu.eval.runner \
        --benchmark "$BENCHMARK" --model_path "$CKPT" \
        --conv_mode "$CONV_MODE" \
        --answers_file "$OUT_DIR/answers_${CHUNKS}_${IDX}.jsonl" \
        --num_chunks "$CHUNKS" --chunk_idx "$IDX" $DATASET_ARG &
done
wait

cat "$OUT_DIR"/answers_${CHUNKS}_*.jsonl > "$OUT_DIR/answers.jsonl"

python -m cambrian_tpu.eval.score \
    --benchmark "$BENCHMARK" --answers_file "$OUT_DIR/answers.jsonl" \
    --model_id "$MODEL_ID" --experiment_csv eval_output/experiments.csv
