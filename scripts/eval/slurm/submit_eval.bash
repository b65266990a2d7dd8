#!/bin/bash
# Submit ONE benchmark as a slurm job (reference eval/slurm/submit_eval.bash,
# minus the GPU gres plumbing — TPU workers are provisioned by the partition).
#
# bash submit_eval.bash --benchmark <name> --ckpt <ckpt> [--conv_mode <mode>]
#                       [--time <hh:mm:ss>] [--dependency <job_id>]
set -e

conv_mode="llama_3"
time_limit="10:00:00"
dependency=""

usage() {
  cat <<EOF
Usage: bash slurm/submit_eval.bash --benchmark <benchmark> --ckpt <ckpt> [OPTIONS]

Submit a job to evaluate a model checkpoint on one benchmark.

Required:
  --benchmark <benchmark>   Benchmark name (see eval.base.BENCHMARKS).
  --ckpt <ckpt>             Path to the model checkpoint.
Optional:
  --conv_mode <conv_mode>   Conversation template (default: llama_3).
  --time <time>             Slurm time limit (default: 10:00:00).
  --dependency <job_id>     Run after the given job finishes.
EOF
}

if [[ $# -eq 0 ]]; then usage; exit 0; fi
while [[ $# -gt 0 ]]; do
  case "$1" in
    --benchmark) benchmark="$2"; shift 2 ;;
    --ckpt) ckpt="$2"; shift 2 ;;
    --conv_mode) conv_mode="$2"; shift 2 ;;
    --time) time_limit="$2"; shift 2 ;;
    --dependency) dependency="$2"; shift 2 ;;
    -h|--help) usage; exit 0 ;;
    *) echo "Unknown argument: $1"; usage; exit 1 ;;
  esac
done
: "${benchmark:?--benchmark required}" "${ckpt:?--ckpt required}"

extra=()
[[ -n "$dependency" ]] && extra+=(--dependency="afterok:$dependency")

mkdir -p eval_output/slurm
sbatch --time="$time_limit" \
    --export=BENCHMARK="$benchmark",CKPT="$ckpt",CONV_MODE="$conv_mode" \
    "${extra[@]}" \
    "$(dirname "$0")/eval_benchmark.slurm"
