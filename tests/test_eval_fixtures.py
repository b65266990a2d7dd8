"""Golden-fixture eval tests (VERDICT r2 item 5): every adapter consumes a
checked-in record whose field names mirror the REFERENCE eval scripts'
actual usage — the contract for first contact with real data.

Field provenance (reference eval/eval/*):
- gqa: question/answer/fullAnswer/imageId (gqa_eval.py)
- textvqa: question/answers/ocr_tokens, OCR folded into prompt
  (textvqa_eval.py:35-43)
- seed: choice_a..d columns, image is a LIST (seed_eval.py:36-59)
- qbench: candidates + correct_ans TEXT + type (qbench_eval.py:35-43)
- blink/ade/coco/omni: preformatted 'prompt', '(A)'-style answers
  (blink_eval.py:36, ade_eval.py:35, ade_test.py:52)
- mmmu: options as a string-repr list, image_1 (mmmu_eval.py:42)
- mmbench: hint folded when != 'nan', index, l2-category
  (mmbench_en_eval.py:41-42)
- mmvp: options as ONE '(a) .. (b) ..' string (mmvp_eval.py:36-44)
- synthdog: ground_truth is a gt_parse JSON string (synthdog_eval.py:97-98)
- mathvista: query/decoded_image/question_type (mathvista data layout)
- vstar: text/label (vstar_eval.py)

Strict-mode field resolution: a record missing a required field must raise
at build_prompt (row 1), never silently map to None.
"""

import json
import os

import numpy as np
import pytest

from cambrian_tpu.eval import BENCHMARKS

PIL = pytest.importorskip("PIL.Image")

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "eval",
                        "records.json")


def _load(name):
    with open(FIXTURES) as f:
        table = json.load(f)
    records = []
    for rec in table[name]:
        rec = dict(rec)
        for k, v in rec.items():
            if v == "<IMAGE>":
                rec[k] = PIL.new("RGB", (32, 32), (200, 20, 20))
            elif v == ["<IMAGE>"]:
                rec[k] = [PIL.new("RGB", (32, 32), (200, 20, 20))]
        records.append(rec)
    return records


def test_fixture_covers_every_benchmark():
    with open(FIXTURES) as f:
        table = json.load(f)
    missing = sorted(set(BENCHMARKS) - {k for k in table if not
                                        k.startswith("_")})
    assert not missing, f"benchmarks without golden fixtures: {missing}"


@pytest.mark.parametrize("name", sorted(BENCHMARKS))
def test_adapter_consumes_reference_layout(name):
    bench = BENCHMARKS[name]
    for record in _load(name):
        prompt = bench.build_prompt(dict(record))
        assert isinstance(prompt["text"], str) and prompt["text"].strip()
        gold = prompt.get("answer")
        row = {**{k: v for k, v in prompt.items() if k != "image"},
               "prediction": str(gold), "question_id": 0}
        wrong = {**row, "prediction": "zzz unrelated"}
        m_ok, m_bad = bench.score([row]), bench.score([wrong])
        assert bench.primary_metric in m_ok, (name, m_ok)
        assert m_ok[bench.primary_metric] >= m_bad[bench.primary_metric]


def test_seed_choice_columns_and_list_image():
    p = BENCHMARKS["seed"].build_prompt(_load("seed")[0])
    assert p["choices"] == ["a cup", "a book", "a phone", "a plant"]
    assert "A. a cup" in p["text"] and "D. a plant" in p["text"]
    assert hasattr(p["image"], "size")  # unwrapped from the list
    assert p["answer"] == "A"


def test_mmmu_string_options_and_image1():
    p = BENCHMARKS["mmmu"].build_prompt(_load("mmmu")[0])
    assert p["choices"] == ["Impressionism", "Cubism", "Baroque"]
    assert "B. Cubism" in p["text"]
    assert hasattr(p["image"], "size")
    assert p["category"] == "Art_Theory"


def test_cvbench_preformatted_prompt_and_paren_answer():
    for name in ("ade", "coco", "omni", "blink"):
        rec = _load(name)[0]
        p = BENCHMARKS[name].build_prompt(rec)
        assert p["text"].startswith(rec["prompt"].split("\n")[0])
        assert "(A)" in p["text"]  # preformatted options kept verbatim
        assert p["answer"] in ("A", "B")  # parens stripped


def test_qbench_candidates_and_text_answer():
    p = BENCHMARKS["qbench"].build_prompt(_load("qbench")[0])
    assert p["choices"] == ["High", "Medium", "Low"]
    assert p["answer"] == "B"  # correct_ans TEXT mapped to its letter


def test_textvqa_ocr_tokens_in_prompt():
    p = BENCHMARKS["textvqa"].build_prompt(_load("textvqa")[0])
    assert "Reference OCR tokens: STOP, AHEAD" in p["text"]


def test_mmbench_hint_folding():
    with_hint, nan_hint = _load("mmbench_en")
    p1 = BENCHMARKS["mmbench_en"].build_prompt(with_hint)
    assert p1["text"].startswith("Compare the two objects.")
    p2 = BENCHMARKS["mmbench_en"].build_prompt(nan_hint)
    assert not p2["text"].startswith("nan")


def test_mmvp_option_string_parsing():
    p = BENCHMARKS["mmvp"].build_prompt(_load("mmvp")[0])
    assert p["choices"] == ["yes", "no"]
    assert p["answer"] == "A"


def test_synthdog_gt_parse():
    p = BENCHMARKS["synthdog"].build_prompt(_load("synthdog")[0])
    assert p["answer"] == "hello world"


def test_ai2d_index_answer():
    p = BENCHMARKS["ai2d"].build_prompt(_load("ai2d")[0])
    assert p["answer"] == "C"  # index string '2' -> third option


def test_mathvista_multichoice_text_answer():
    rows = _load("mathvista")
    p_free = BENCHMARKS["mathvista"].build_prompt(rows[0])
    assert p_free["answer"] == "42"
    p_mc = BENCHMARKS["mathvista"].build_prompt(rows[1])
    assert p_mc["answer"] == "A"  # choice text mapped to letter


def test_strict_mode_fails_loudly():
    """A schema mismatch (missing question field) raises at row 1 instead of
    silently scoring garbage."""
    with pytest.raises(KeyError) as exc:
        BENCHMARKS["gqa"].build_prompt({"unexpected_field": 1})
    assert "question" in str(exc.value)
    with pytest.raises(KeyError):
        BENCHMARKS["mmbench_en"].build_prompt({"image": None})


def test_dump_records_format(capsys):
    from cambrian_tpu.eval.runner import _dump_record

    _dump_record({"question": "q?", "image": PIL.new("RGB", (8, 8)),
                  "blob": b"\x00" * 50, "long": "x" * 500},
                 "gqa", 0)
    err = capsys.readouterr().err
    assert "[dump_records] gqa[0]" in err
    assert "<image" in err and "<50 bytes>" in err and "…" in err
