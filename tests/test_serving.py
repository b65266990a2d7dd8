"""Serving-stack integration test: controller + model worker over real HTTP
sockets, streaming a generation end-to-end (the reference's
serve/test_message.py smoke test, automated)."""

import base64
import json
import os
import socket
import sys
import threading
import time
from io import BytesIO

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from util import make_tiny_checkpoint  # noqa: E402

requests = pytest.importorskip("requests")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    from cambrian_tpu.serve.controller import Controller, serve as serve_controller
    from cambrian_tpu.serve.model_worker import ModelWorker, serve as serve_worker

    ckpt = str(tmp_path_factory.mktemp("serve_ckpt"))
    make_tiny_checkpoint(ckpt)

    cport, wport = _free_port(), _free_port()
    controller = Controller("shortest_queue")
    cserver = serve_controller(controller, "localhost", cport)
    controller_addr = f"http://localhost:{cport}"
    worker_addr = f"http://localhost:{wport}"

    worker = ModelWorker(
        controller_addr, worker_addr, "w0", ckpt, None, "cambrian-tiny",
        limit_model_concurrency=2, register=True,
    )
    wserver = serve_worker(worker, "localhost", wport)
    yield controller_addr, worker_addr, worker
    cserver.shutdown()
    wserver.shutdown()


def test_register_and_list_models(stack):
    controller_addr, worker_addr, worker = stack
    r = requests.post(controller_addr + "/list_models", json={})
    assert r.json()["models"] == ["cambrian-tiny"]
    r = requests.post(controller_addr + "/get_worker_address",
                      json={"model": "cambrian-tiny"})
    assert r.json()["address"] == worker_addr
    r = requests.post(controller_addr + "/get_worker_address",
                      json={"model": "missing-model"})
    assert r.json()["address"] == ""


def test_worker_status(stack):
    controller_addr, worker_addr, worker = stack
    r = requests.post(worker_addr + "/worker_get_status", json={})
    status = r.json()
    assert status["model_names"] == ["cambrian-tiny"]
    assert status["queue_length"] == 0


def test_generate_stream_through_controller(stack):
    from PIL import Image

    controller_addr, worker_addr, worker = stack
    img = Image.new("RGB", (48, 32), (10, 200, 100))
    buf = BytesIO()
    img.save(buf, format="PNG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()

    prompt = "describe the <image> please"
    pload = {
        "model": "cambrian-tiny",
        "prompt": prompt,
        "images": [img_b64],
        "temperature": 0.0,
        "top_p": 1.0,
        "max_new_tokens": 5,
    }
    r = requests.post(controller_addr + "/worker_generate_stream", json=pload,
                      stream=True, timeout=300)
    chunks = [c for c in r.iter_lines(decode_unicode=False, delimiter=b"\0") if c]
    assert len(chunks) >= 1
    datas = [json.loads(c.decode()) for c in chunks]
    assert all(d["error_code"] == 0 for d in datas), datas
    # cumulative text starts with the prompt and grows
    assert datas[-1]["text"].startswith(prompt)
    assert len(datas[-1]["text"]) >= len(datas[0]["text"])


def test_generate_stream_image_count_mismatch(stack):
    controller_addr, worker_addr, worker = stack
    pload = {
        "model": "cambrian-tiny",
        "prompt": "no image marker here",
        "images": ["aGVsbG8="],
        "temperature": 0.0,
        "max_new_tokens": 4,
    }
    r = requests.post(worker_addr + "/worker_generate_stream", json=pload,
                      stream=True, timeout=60)
    chunks = [c for c in r.iter_lines(decode_unicode=False, delimiter=b"\0") if c]
    data = json.loads(chunks[-1].decode())
    assert data["error_code"] == 1  # graceful error, not a crash


def test_vote_log_format(tmp_path, monkeypatch):
    """upvote/downvote/flag records match the reference's conv-log schema
    (gradio_web_server.py:81-109): tstamp/type/model/state(+ip), one JSON
    object per line, appended to the dated conversation log."""
    import json

    from cambrian_tpu.serve import gradio_web_server as gws

    monkeypatch.setattr(gws, "LOGDIR", str(tmp_path))
    state = {"history": [["hi <image>", "a reply"]]}
    gws.log_vote("upvote", "cambrian-tiny", state, ip="1.2.3.4")
    gws.log_vote("downvote", "cambrian-tiny", state)
    gws.log_vote("flag", "cambrian-tiny", state)

    logfile = gws.get_conv_log_filename()
    rows = [json.loads(l) for l in open(logfile)]
    assert [r["type"] for r in rows] == ["upvote", "downvote", "flag"]
    assert all(r["model"] == "cambrian-tiny" for r in rows)
    assert rows[0]["ip"] == "1.2.3.4" and "ip" not in rows[1]
    assert all(r["state"] == state for r in rows)
    assert all(isinstance(r["tstamp"], float) for r in rows)


def test_regenerate_pops_last_exchange():
    """Regenerate semantics (gradio_web_server.py:111-118): the last
    assistant reply is dropped and the last user message is re-submitted."""
    from cambrian_tpu.serve.gradio_web_server import pop_last_exchange

    history = [["q1", "a1"], ["q2", "a2"]]
    shorter, last_user = pop_last_exchange(history)
    assert shorter == [["q1", "a1"]]
    assert last_user == "q2"
    assert pop_last_exchange([]) == ([], "")
