"""Continuous-batching worker: concurrent streamed requests through one
shared-cache engine behind the standard worker HTTP API."""

import json
import os
import socket
import sys
import threading

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
def cb_worker(tmp_path_factory):
    from cambrian_tpu.serve.model_worker import ModelWorker, serve as serve_worker

    ckpt = str(tmp_path_factory.mktemp("cb_serve_ckpt"))
    make_tiny_checkpoint(ckpt)
    port = _free_port()
    worker = ModelWorker(
        "http://unused", f"http://localhost:{port}", "w0", ckpt, None,
        "cambrian-tiny", register=False, continuous_batching=True, num_slots=2,
    )
    server = serve_worker(worker, "localhost", port)
    yield f"http://localhost:{port}"
    server.shutdown()


def _stream_request(addr, prompt, out, idx):
    r = requests.post(addr + "/worker_generate_stream", json={
        "model": "cambrian-tiny", "prompt": prompt, "temperature": 0.0,
        "max_new_tokens": 5,
    }, stream=True, timeout=300)
    chunks = [json.loads(c.decode()) for c in
              r.iter_lines(decode_unicode=False, delimiter=b"\0") if c]
    out[idx] = chunks


def test_concurrent_streams(cb_worker):
    out = {}
    threads = [
        threading.Thread(target=_stream_request, args=(cb_worker, p, out, i))
        for i, p in enumerate(["a cat sat on", "hello world what is"])
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(out) == {0, 1}
    for i, chunks in out.items():
        assert len(chunks) >= 1
        assert all(c["error_code"] == 0 for c in chunks), chunks
        # cumulative text begins with the prompt
        assert chunks[-1]["text"].startswith(("a cat", "hello"))
