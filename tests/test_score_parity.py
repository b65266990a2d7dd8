"""Scorer parity against the REFERENCE ``*_test.py`` run as a live oracle
(VERDICT r4 item 7: apply the AST/import-oracle pattern that proved packing
parity to the benchmark scorers).

Each reference scorer module is importable standalone — pure json/csv/os/
datetime, no torch (verified: eval/eval/{mme,pope,ade,coco,omni,mathvista}/
*_test.py) — so we import ``compute_metrics`` straight from the reference
tree, feed both scorers the SAME logical answer set (reference field names:
answer/gt_answer/category/type/options; ours: prediction/answer/category/
question_type/choices), and assert the metric values agree.

The answer sets deliberately include the messy shapes the reference
extractors handle — "The answer is (B).", trailing dots, lowercase "(b)",
option TEXT instead of a letter (omni), numerically-close free-form answers
(mathvista's relaxed 5%), both-right/one-wrong MME pairs — so the parity
claim covers extraction, not just counting.
"""

import csv
import importlib.util
import json
import os

import pytest

from cambrian_tpu.eval import BENCHMARKS

REF_EVAL = "/root/reference/eval/eval"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EVAL), reason="reference tree not present")


def _ref_metrics(name, rows, tmp_path):
    """Run the reference benchmark's compute_metrics over reference-layout
    rows; return the CSV row it appends (all values are strings)."""
    path = os.path.join(REF_EVAL, name, f"{name}_test.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    jsonl = tmp_path / f"{name}_answers.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    csv_file = tmp_path / f"{name}_experiments.csv"
    incorrect = tmp_path / "incorrect" / f"{name}.jsonl"
    mod.compute_metrics(str(jsonl), str(incorrect), str(csv_file))
    with open(csv_file) as f:
        return list(csv.DictReader(f))[-1]


def _ours(name, rows):
    return BENCHMARKS[name].score(rows)


# ---------------------------------------------------------------------------
# POPE — accuracy over first-word yes/no
# ---------------------------------------------------------------------------

def test_pope_accuracy_parity(tmp_path):
    cases = [  # (model output, gold)
        ("Yes", "yes"),
        ("yes.", "yes"),
        ("Yes, it is a chair", "yes"),
        ("No", "yes"),
        ("no", "no"),
        ("No, there is none.", "no"),
        ("Yes", "no"),
        ("no,", "no"),
    ]
    ref_rows = [{"model_id": "m", "question_id": i, "answer": p,
                 "gt_answer": g} for i, (p, g) in enumerate(cases)]
    our_rows = [{"question_id": i, "prediction": p, "answer": g}
                for i, (p, g) in enumerate(cases)]
    ref = _ref_metrics("pope", ref_rows, tmp_path)
    ours = _ours("pope", our_rows)
    assert float(ref["accuracy"]) == pytest.approx(100.0 * ours["accuracy"])
    assert float(ref["correct"]) == sum(
        1 for p, g in cases
        if p.lower().split()[0].rstrip(".:,") == g)


# ---------------------------------------------------------------------------
# MME — paired acc+ and perception/cognition totals
# ---------------------------------------------------------------------------

def test_mme_scores_parity(tmp_path):
    # Reference layout contract: an image's two questions are consecutive
    # lines and categories are contiguous even-sized blocks (the acc+ logic
    # in mme_test.py:55-63 is index-parity based and needs exactly this).
    pairs = [  # (category, image, [(pred, gold), (pred, gold)])
        ("existence", "e1", [("Yes", "yes"), ("No", "no")]),      # both right
        ("existence", "e2", [("Yes", "yes"), ("Yes", "no")]),     # one wrong
        ("existence", "e3", [("No.", "yes"), ("No", "no")]),      # one wrong
        ("count", "c1", [("Yes", "yes"), ("No", "no")]),          # both right
        ("count", "c2", [("No", "yes"), ("Yes", "no")]),          # both wrong
        ("code_reasoning", "r1", [("Yes", "yes"), ("No", "no")]), # both right
        ("code_reasoning", "r2", [("Yes", "no"), ("No", "no")]),  # one wrong
    ]
    ref_rows, our_rows = [], []
    for cat, img, qa in pairs:
        for j, (p, g) in enumerate(qa):
            ref_rows.append({"model_id": "m", "category": cat,
                             "question_id": f"{img}/{j}", "answer": p,
                             "gt_answer": g})
            our_rows.append({"category": cat, "image_id": img,
                             "prediction": p, "answer": g})
    ref = _ref_metrics("mme", ref_rows, tmp_path)
    ours = _ours("mme", our_rows)

    assert float(ref["accuracy"]) == pytest.approx(100.0 * ours["accuracy"])
    assert float(ref["Perception"]) == pytest.approx(ours["perception_score"])
    assert float(ref["Cognition"]) == pytest.approx(ours["cognition_score"])
    assert float(ref["total_score"]) == pytest.approx(
        ours["perception_score"] + ours["cognition_score"])


# ---------------------------------------------------------------------------
# CV-Bench (ade/coco share one scorer; omni also accepts option TEXT)
# ---------------------------------------------------------------------------

_CVB_CASES = [  # (model output, gold "(X)", options, hit?)
    ("(B)", "(B)", ["a", "b"], True),
    ("B.", "(B)", ["a", "b"], True),
    ("The answer is (A).", "(A)", ["a", "b"], True),
    ("answer: (b)", "(B)", ["a", "b"], True),
    ("(A)", "(B)", ["a", "b"], False),
    ("C", "(B)", ["a", "b"], False),
]


@pytest.mark.parametrize("name", ["ade", "coco"])
def test_cvbench_2d_accuracy_parity(name, tmp_path):
    ref_rows = [{"model_id": "m", "category": "count", "answer": p,
                 "gt_answer": g} for p, g, _, _ in _CVB_CASES]
    our_rows = [{"prediction": p, "answer": g.strip("()"), "choices": opts}
                for p, g, opts, _ in _CVB_CASES]
    ref = _ref_metrics(name, ref_rows, tmp_path)
    ours = _ours(name, our_rows)
    expected = sum(h for *_, h in _CVB_CASES) / len(_CVB_CASES)
    assert float(ref["accuracy"]) == pytest.approx(expected)
    assert ours["accuracy"] == pytest.approx(expected)


def test_cvbench_omni_text_answer_parity(tmp_path):
    cases = _CVB_CASES + [
        # omni_test.py:66-71 credits the raw option TEXT too — but only
        # after extract_mcq_answer truncates the prediction to its first
        # character, so the branch can only fire for single-char options
        ("x", "(A)", ["x", "y"], True),
    ]
    ref_rows = [{"model_id": "m", "category": "depth", "answer": p,
                 "gt_answer": g, "options": opts} for p, g, opts, _ in cases]
    our_rows = [{"prediction": p, "answer": g.strip("()"), "choices": opts}
                for p, g, opts, _ in cases]
    ref = _ref_metrics("omni", ref_rows, tmp_path)
    ours = _ours("omni", our_rows)
    expected = sum(h for *_, h in cases) / len(cases)
    assert float(ref["accuracy"]) == pytest.approx(expected)
    assert ours["accuracy"] == pytest.approx(expected)


# ---------------------------------------------------------------------------
# MathVista — exact OR 5%-relaxed numeric, per-category
# ---------------------------------------------------------------------------

def test_mathvista_accuracy_parity(tmp_path):
    cases = [  # (model output, gold, question_type, category)
        ("B", "B", "multi_choice", "math-targeted-vqa"),
        ("b", "B", "multi_choice", "math-targeted-vqa"),   # .lower() both
        ("A", "B", "multi_choice", "math-targeted-vqa"),
        ("42", "42", "free_form", "general-vqa"),
        ("41", "42", "free_form", "general-vqa"),          # 2.4% off: credit
        ("100", "42", "free_form", "general-vqa"),
        ("0.5", "0.52", "free_form", "general-vqa"),       # 4% of pred: credit
        ("red", "red", "free_form", "general-vqa"),
        ("blue", "red", "free_form", "general-vqa"),
    ]
    ref_rows = [{"model_id": "m", "category": c, "answer": p,
                 "gt_answer": g, "type": t} for p, g, t, c in cases]
    our_rows = [{"prediction": p, "answer": g, "question_type": t,
                 "category": c} for p, g, t, c in cases]
    ref = _ref_metrics("mathvista", ref_rows, tmp_path)
    ours = _ours("mathvista", our_rows)
    assert float(ref["accuracy"]) == pytest.approx(ours["accuracy"])
    # per-category tables agree too (reference stores a dict-string per
    # category column; ours exposes acc/<category> rows)
    for cat in {c for *_, c in cases}:
        ref_cat = eval(ref[cat])  # noqa: S307 — our own fixture CSV
        assert ref_cat["accurcay"] == pytest.approx(  # sic, reference key
            ours[f"acc/{cat}"])


def test_mathvista_prompt_maps_gold_to_letter():
    rec = {"question": "Which is bigger?", "question_type": "multi_choice",
           "choices": ["3", "4"], "answer": "4",
           "metadata": {"category": "math-targeted-vqa"}}
    p = BENCHMARKS["mathvista"].build_prompt(rec)
    assert p["answer"] == "B"          # reverse_dict mapping, eval.py:106-111
    assert p["category"] == "math-targeted-vqa"
    assert p["question_type"] == "multi_choice"
