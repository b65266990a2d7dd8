#!/bin/bash
# Fan the whole suite out as parallel slurm jobs
# (reference eval/slurm/submit_all_benchmarks_parallel.bash).
: "${CKPT:?set CKPT}"
CONV_MODE="${CONV_MODE:-llama_3}"

BENCHMARKS=(mme gqa scienceqa textvqa pope mmbench_en mmbench_cn seed mmvet \
            mmmu mathvista ai2d chartqa docvqa infovqa stvqa ocrbench mmstar \
            realworldqa synthdog qbench blink mmvp vstar vizwiz ade coco omni)

mkdir -p eval_output/slurm
for BENCH in "${BENCHMARKS[@]}"; do
    sbatch --export=BENCHMARK="$BENCH",CKPT="$CKPT",CONV_MODE="$CONV_MODE" \
        "$(dirname "$0")/eval_benchmark.slurm"
done
