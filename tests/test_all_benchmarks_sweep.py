"""Registry-wide sweep: every benchmark's build_prompt and scorer run on
synthetic records with the published field layouts (catches field-mapping
regressions without network access)."""

import numpy as np
import pytest

from cambrian_tpu.eval import BENCHMARKS

PIL = pytest.importorskip("PIL.Image")


def _img():
    return PIL.new("RGB", (32, 32), (200, 20, 20))


def _record_for(name: str) -> dict:
    mcq = {"question": "What color?", "choices": ["red", "green"],
           "answer": "A", "image": _img()}
    short = {"question": "What is shown?", "answer": "red square",
             "answers": ["red square"] * 10, "image": _img()}
    per_name = {
        "mme": {"question": "Is it red?", "answer": "Yes", "image": _img(),
                "question_id": "img0", "category": "color"},
        "mmbench_en": {"question": "What color?", "A": "red", "B": "green",
                       "C": "blue", "D": "", "answer": "A", "image": _img()},
        "mmbench_cn": {"question": "什么颜色?", "A": "红", "B": "绿",
                       "C": "", "D": "", "answer": "A", "image": _img()},
        "scienceqa": {"question": "What color?", "choices": ["red", "green"],
                      "answer": 0, "hint": "Look closely.", "image": _img()},
        "mmmu": {"question": "What color?", "options": ["red", "green"],
                 "answer": "A", "image": _img(),
                 "question_type": "multiple-choice"},
        "mathvista": {"question": "1+1?", "answer": "2", "image": _img(),
                      "question_type": "free_form"},
        "synthdog": {"ground_truth": "hello world", "image": _img()},
        "pope": {"question": "Is there a dog?", "answer": "no", "image": _img()},
        "docvqa": {"question": "Title?", "answers": ["Annual Report"],
                   "answer": "Annual Report", "image": _img()},
        "infovqa": {"question": "Total?", "answers": ["42"], "answer": "42",
                    "image": _img()},
        "stvqa": {"question": "Sign text?", "answers": ["stop"],
                  "answer": "stop", "image": _img()},
        "chartqa": {"question": "Value in 2020?", "answer": "100",
                    "image": _img()},
        "mmvet": {"question": "Describe.", "answer": "a red square",
                  "image": _img()},
        "ocrbench": {"question": "Read the text.", "answer": "red",
                     "image": _img()},
        "vizwiz": {"question": "What is this?", "answer": "red square",
                   "answers": ["red square"] * 10, "image": _img()},
        "gqa": short, "textvqa": short,
    }
    return per_name.get(name, dict(mcq))


@pytest.mark.parametrize("name", sorted(BENCHMARKS))
def test_build_prompt_and_score(name):
    bench = BENCHMARKS[name]
    record = _record_for(name)
    prompt = bench.build_prompt(dict(record))
    assert isinstance(prompt["text"], str) and prompt["text"].strip()
    assert "answer" in prompt

    # simulate a correct and an incorrect prediction through the scorer
    gold = prompt.get("answer")
    row = {**{k: v for k, v in prompt.items() if k != "image"},
           "prediction": str(gold), "question_id": 0}
    wrong_row = {**row, "prediction": "zzz unrelated"}
    metrics = bench.score([row])
    metrics_wrong = bench.score([wrong_row])
    assert bench.primary_metric in metrics, (name, metrics)
    assert all(np.isfinite(list(m.values())).all() if m else True
               for m in (metrics, metrics_wrong))
    # the correct prediction must not score WORSE than the wrong one
    assert metrics[bench.primary_metric] >= metrics_wrong[bench.primary_metric], name


def test_mmmu_open_row_and_categories():
    bench = BENCHMARKS["mmmu"]
    open_rec = {"id": "validation_Art_Theory_3", "question": "How many?",
                "answer": ["3", "three"], "image": _img(),
                "question_type": "open"}
    prompt = bench.build_prompt(dict(open_rec))
    assert prompt["question_type"] == "open"
    assert prompt["category"] == "Art_Theory"
    rows = [
        {**{k: v for k, v in prompt.items() if k != "image"},
         "prediction": "I think the answer is 3."},
        {**{k: v for k, v in prompt.items() if k != "image"},
         "prediction": "there are seven", "category": "Math"},
    ]
    metrics = bench.score(rows)
    assert metrics["accuracy"] == 0.5
    assert metrics["acc/Art_Theory"] == 1.0
    assert metrics["acc/Math"] == 0.0


def test_seed_blink_category_columns():
    for name in ("seed", "blink"):
        bench = BENCHMARKS[name]
        rec = {"question": "What color?", "choices": ["red", "green"],
               "answer": "A", "image": _img(), "question_type": "Scene Understanding"}
        prompt = bench.build_prompt(dict(rec))
        assert prompt["category"] == "Scene Understanding"
        row = {**{k: v for k, v in prompt.items() if k != "image"},
               "prediction": "A"}
        metrics = bench.score([row])
        assert metrics["accuracy"] == 1.0
        assert metrics["acc/Scene Understanding"] == 1.0


def test_mmvet_submission_artifact(tmp_path):
    import json

    from cambrian_tpu.eval.score import write_submission

    bench = BENCHMARKS["mmvet"]
    rec = {"id": "v1_0", "question": "Describe.", "answer": "a red square",
           "image": _img()}
    prompt = bench.build_prompt(dict(rec))
    assert prompt["submission_id"] == "v1_0"
    answers = tmp_path / "answers.jsonl"
    row = {**{k: v for k, v in prompt.items() if k != "image"},
           "prediction": "a red square on white", "question_id": "v1_0"}
    answers.write_text(json.dumps(row) + "\n")
    path = write_submission("mmvet", str(answers), "mymodel", str(tmp_path))
    assert path.endswith("mymodel_mmvet_submission.json")
    obj = json.loads(open(path).read())
    assert obj == {"v1_0": "a red square on white"}
    # benchmarks without a submission format return None
    assert write_submission("gqa", str(answers), "mymodel", str(tmp_path)) is None


def test_infovqa_distinct_dataset_config():
    assert BENCHMARKS["infovqa"].config == "InfographicVQA"
    assert BENCHMARKS["docvqa"].config == "DocVQA"
