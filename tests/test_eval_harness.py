"""Eval harness tests: shared metrics, registry completeness, and an
end-to-end benchmark run (generate -> score -> tabulate) with the tiny model
on a fabricated local dataset."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from util import make_tiny_checkpoint  # noqa: E402

from cambrian_tpu.eval import BENCHMARKS  # noqa: E402
from cambrian_tpu.eval.base import (  # noqa: E402
    anls,
    extract_choice_letter,
    mme_score,
    multiple_choice_accuracy,
    normalize_answer,
    relaxed_accuracy,
    vqa_soft_accuracy,
    yes_no_metrics,
)


def test_registry_covers_the_suite():
    expected = {
        "gqa", "vizwiz", "scienceqa", "textvqa", "pope", "mme", "mmbench_en",
        "mmbench_cn", "seed", "mmvet", "mmmu", "mathvista", "ai2d", "chartqa",
        "docvqa", "infovqa", "stvqa", "ocrbench", "mmstar", "realworldqa",
        "synthdog", "qbench", "blink", "mmvp", "vstar", "ade", "coco", "omni",
    }
    assert expected <= set(BENCHMARKS), expected - set(BENCHMARKS)


def test_normalize_answer():
    assert normalize_answer("The cat!") == "cat"
    assert normalize_answer("Two ") == "2"


def test_extract_choice_letter():
    assert extract_choice_letter("A") == "A"
    assert extract_choice_letter("(B) the cat") == "B"
    assert extract_choice_letter("The answer is C.") == "C"
    assert extract_choice_letter("a red ball", ["a dog", "a red ball"]) == "B"
    assert extract_choice_letter("") == ""


def test_mcq_accuracy():
    records = [
        {"prediction": "B", "answer": "B", "choices": ["x", "y"]},
        {"prediction": "the answer is A", "answer": "B", "choices": ["x", "y"]},
    ]
    assert multiple_choice_accuracy(records)["accuracy"] == 0.5


def test_vqa_soft_accuracy():
    records = [{
        "prediction": "cat",
        "answer": "cat",
        "answers": ["cat", "cat", "cat", "dog", "dog", "cat", "cat", "cat",
                    "cat", "cat"],
    }]
    assert vqa_soft_accuracy(records)["accuracy"] == 1.0
    records[0]["answers"] = ["cat", "dog", "dog", "dog"]
    assert abs(vqa_soft_accuracy(records)["accuracy"] - 1 / 3) < 1e-9


def test_yes_no_metrics():
    records = [
        {"prediction": "Yes, it is", "answer": "yes"},
        {"prediction": "no", "answer": "yes"},
        {"prediction": "no", "answer": "no"},
    ]
    m = yes_no_metrics(records)
    assert abs(m["accuracy"] - 2 / 3) < 1e-9
    assert m["precision"] == 1.0 and m["recall"] == 0.5


def test_mme_score():
    records = [
        {"prediction": "yes", "answer": "yes", "image_id": "a"},
        {"prediction": "no", "answer": "no", "image_id": "a"},
        {"prediction": "yes", "answer": "no", "image_id": "b"},
        {"prediction": "no", "answer": "no", "image_id": "b"},
    ]
    m = mme_score(records)
    assert m["accuracy"] == 0.75 and m["acc_plus"] == 0.5
    assert m["score"] == 125.0


def test_anls_and_relaxed():
    assert anls([{"prediction": "hello", "answer": "hello"}])["anls"] == 1.0
    assert anls([{"prediction": "xyz", "answer": "hello"}])["anls"] == 0.0
    assert relaxed_accuracy([{"prediction": "102", "answer": "100"}])["accuracy"] == 1.0
    assert relaxed_accuracy([{"prediction": "110", "answer": "100"}])["accuracy"] == 0.0


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    datasets = pytest.importorskip("datasets")
    from PIL import Image

    d = tmp_path_factory.mktemp("evalrun")
    ckpt = str(d / "ckpt")
    make_tiny_checkpoint(ckpt)

    records = [
        {"question": "What color is the square?",
         "choices": ["red", "green", "blue"], "answer": "A",
         "image": Image.new("RGB", (48, 48), (220, 10, 10))}
        for _ in range(4)
    ]
    ds = datasets.Dataset.from_list(records)
    ds_path = str(d / "cvbench_like")
    ds.save_to_disk(ds_path)
    return d, ckpt, ds_path


def test_run_benchmark_end_to_end(eval_setup):
    from cambrian_tpu.eval.runner import run_benchmark
    from cambrian_tpu.eval.score import append_experiment_row, score_answers
    from cambrian_tpu.eval.tabulate import pivot, read_rows, write_pivot
    from cambrian_tpu.models.builder import load_pretrained_model

    d, ckpt, ds_path = eval_setup
    bundle = load_pretrained_model(ckpt)
    answers_file = str(d / "answers" / "ade.jsonl")

    run_benchmark("ade", bundle, "llama_3", answers_file,
                  dataset_path=ds_path, num_chunks=2, chunk_idx=0,
                  max_new_tokens=4)
    rows = [json.loads(l) for l in open(answers_file)]
    assert len(rows) == 2  # chunk 0 of 2 over 4 records
    assert all("prediction" in r and r["answer"] == "A" for r in rows)

    metrics = score_answers("ade", answers_file)
    assert "accuracy" in metrics and 0.0 <= metrics["accuracy"] <= 1.0

    csv_file = str(d / "experiments.csv")
    append_experiment_row(csv_file, "tiny-model", "ade", metrics)
    table = pivot(read_rows([csv_file]))
    assert "ade" in table["tiny-model"]
    out_pivot = str(d / "pivot.csv")
    write_pivot(table, out_pivot)
    assert os.path.exists(out_pivot)


def test_mmbench_circular_eval_grouping():
    """Rotated copies share index % 1e6; a question counts only if every
    rotation is right. q1 (1, 1000001): both right. q2 (2, 1000002): one
    wrong -> circular 0.5, per-row 0.75."""
    from cambrian_tpu.eval.base import circular_multiple_choice_accuracy

    rows = [
        {"question_id": 1, "prediction": "A", "answer": "A",
         "choices": ["x", "y"]},
        {"question_id": 1000001, "prediction": "B", "answer": "B",
         "choices": ["y", "x"]},
        {"question_id": 2, "prediction": "A", "answer": "A",
         "choices": ["x", "y"]},
        {"question_id": 1000002, "prediction": "A", "answer": "B",
         "choices": ["y", "x"]},
    ]
    m = circular_multiple_choice_accuracy(rows)
    assert m["accuracy"] == 0.5
    assert m["per_row_accuracy"] == 0.75

    # no rotations present -> degenerates to plain accuracy
    m2 = circular_multiple_choice_accuracy(rows[:3])
    assert m2["accuracy"] == 1.0
