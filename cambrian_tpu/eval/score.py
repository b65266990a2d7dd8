"""Benchmark scoring — the shared ``*_test.py`` (reference
eval/eval/mmmu/mmmu_test.py:10-19,53+): parse an answers JSONL, compute the
benchmark's metrics, append one row to a shared experiments CSV keyed on
(model_id, time) for tabulate.py to pivot.
"""

import argparse
import csv
import json
import os
import time
from typing import Dict, List, Optional

from .base import BENCHMARKS

CSV_FIELDS = ["model_id", "benchmark", "time", "metric", "value", "notes"]


def load_answers(answers_file: str) -> List[dict]:
    rows = []
    with open(answers_file) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    return rows


def score_answers(benchmark_name: str, answers_file: str) -> Dict[str, float]:
    benchmark = BENCHMARKS[benchmark_name]
    return benchmark.score(load_answers(answers_file))


def append_experiment_row(csv_file: str, model_id: str, benchmark_name: str,
                          metrics: Dict[str, float], timestamp: Optional[str] = None):
    benchmark = BENCHMARKS[benchmark_name]
    timestamp = timestamp or time.strftime("%Y-%m-%d %H:%M:%S")
    exists = os.path.exists(csv_file)
    os.makedirs(os.path.dirname(os.path.abspath(csv_file)), exist_ok=True)
    with open(csv_file, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
        if not exists:
            writer.writeheader()
        for metric, value in metrics.items():
            writer.writerow({
                "model_id": model_id, "benchmark": benchmark_name,
                "time": timestamp, "metric": metric,
                "value": round(float(value), 6), "notes": benchmark.notes,
            })


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", required=True, choices=sorted(BENCHMARKS))
    parser.add_argument("--answers_file", required=True)
    parser.add_argument("--model_id", required=True)
    parser.add_argument("--experiment_csv", default="experiments.csv")
    args = parser.parse_args()

    metrics = score_answers(args.benchmark, args.answers_file)
    append_experiment_row(args.experiment_csv, args.model_id, args.benchmark,
                          metrics)
    print(json.dumps({"benchmark": args.benchmark, **metrics}))


if __name__ == "__main__":
    main()
