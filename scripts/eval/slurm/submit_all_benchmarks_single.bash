#!/bin/bash
# Run the WHOLE suite inside one slurm job, sequentially (reference
# eval/slurm/submit_all_benchmarks_single.bash) — one allocation, no queue
# churn; the parallel fan-out lives in submit_all_benchmarks_parallel.bash.
#
# bash submit_all_benchmarks_single.bash --ckpt <ckpt> [--conv_mode <mode>]
#                                        [--time <hh:mm:ss>] [--dependency <id>]
set -e

conv_mode="llama_3"
time_limit="24:00:00"
dependency=""

usage() {
  cat <<EOF
Usage: bash slurm/submit_all_benchmarks_single.bash --ckpt <ckpt> [OPTIONS]

Submit ONE job that runs every benchmark sequentially.

Required:
  --ckpt <ckpt>             Path to the model checkpoint.
Optional:
  --conv_mode <conv_mode>   Conversation template (default: llama_3).
  --time <time>             Slurm time limit (default: 24:00:00).
  --dependency <job_id>     Run after the given job finishes.
EOF
}

if [[ $# -eq 0 ]]; then usage; exit 0; fi
while [[ $# -gt 0 ]]; do
  case "$1" in
    --ckpt) ckpt="$2"; shift 2 ;;
    --conv_mode) conv_mode="$2"; shift 2 ;;
    --time) time_limit="$2"; shift 2 ;;
    --dependency) dependency="$2"; shift 2 ;;
    -h|--help) usage; exit 0 ;;
    *) echo "Unknown argument: $1"; usage; exit 1 ;;
  esac
done
: "${ckpt:?--ckpt required}"

extra=()
[[ -n "$dependency" ]] && extra+=(--dependency="afterok:$dependency")

mkdir -p eval_output/slurm
sbatch --job-name=cambrian-eval-all --time="$time_limit" \
    --output=eval_output/slurm/all-%j.out "${extra[@]}" \
    --wrap="CKPT='$ckpt' CONV_MODE='$conv_mode' bash $(dirname "$0")/../run_all_benchmarks.sh"
