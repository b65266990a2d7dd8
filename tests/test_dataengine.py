"""Data-engine offline-stage tests (network stages are env-gated)."""

import json
import os

import pytest

from cambrian_tpu.dataengine.engine import (
    _extract_json,
    _slugify,
    chat_completion,
    clean_and_rename_files,
    generate_vqa,
    google_search,
    process_json_files,
)


def test_extract_json_variants():
    assert _extract_json('{"a": [1, 2]}') == {"a": [1, 2]}
    assert _extract_json('```json\n{"a": 1}\n```') == {"a": 1}
    assert _extract_json('Here you go:\n["x", "y"]') == ["x", "y"]


def test_slugify():
    assert _slugify("A b/c?.json") == "A_b_c_.json"


def test_process_and_clean(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "Physics.json").write_text(
        '```json\n{"Optics": ["lenses", "mirrors"], "Waves": ["sound"]}\n```'
    )
    (raw / "broken.json").write_text("not json at all {{{")
    out = tmp_path / "norm"
    written = process_json_files(str(raw), str(out))
    assert len(written) == 1
    data = json.loads((out / "Physics.json").read_text())
    assert data["Optics"] == ["lenses", "mirrors"]

    (out / "Weird Name!.json").write_text("{}")
    names = clean_and_rename_files(str(out))
    assert "Weird_Name_.json" in names


def test_generate_vqa(tmp_path):
    records = [{
        "topic": "optics", "images": ["lens.jpg", "mirror.jpg"],
        "qa_pairs": [
            {"question": "What is shown?", "answer": "A lens."},
            {"question": "What reflects light?", "answer": "A mirror."},
        ],
    }]
    out_file = str(tmp_path / "vqa.json")
    out = generate_vqa(records, out_file)
    assert len(out) == 2
    assert out[0]["conversations"][0]["value"].startswith("<image>\n")
    assert out[0]["image"] == "lens.jpg"
    assert out[1]["image"] == "mirror.jpg"
    assert os.path.exists(out_file)


def test_network_stages_require_keys(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.delenv("GOOGLE_API_KEY", raising=False)
    with pytest.raises(EnvironmentError):
        chat_completion([{"role": "user", "content": "hi"}])
    with pytest.raises(EnvironmentError):
        google_search("query")
