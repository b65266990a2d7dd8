"""Logging utilities: StreamToLogger line framing and build_logger plumbing
(reference role: cambrian/utils.py stdout/stderr capture)."""

import logging

from cambrian_tpu.utils import StreamToLogger, build_logger


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        self.records.append(record.getMessage())


def _capture_logger(name):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    h = _Capture()
    logger.addHandler(h)
    return logger, h


def test_stream_to_logger_frames_lines():
    logger, h = _capture_logger("s2l-frames")
    s = StreamToLogger(logger)
    s.write("hello ")
    s.write("world\npartial")
    assert h.records == ["hello world"]
    s.write(" tail\n")
    assert h.records == ["hello world", "partial tail"]
    # multi-line writes emit one record per line; trailing blanks are dropped
    s.write("a\nb\n\n")
    assert h.records[-2:] == ["a", "b"]


def test_stream_to_logger_flush_seals_partial():
    logger, h = _capture_logger("s2l-flush")
    s = StreamToLogger(logger)
    s.write("no newline yet")
    assert h.records == []
    s.flush()
    assert h.records == ["no newline yet"]
    s.flush()  # idempotent
    assert h.records == ["no newline yet"]


def test_stream_to_logger_is_a_text_stream():
    logger, _ = _capture_logger("s2l-proto")
    s = StreamToLogger(logger)
    assert s.writable() and not s.isatty()
    assert isinstance(s.fileno(), int)
    print("via print", file=s)  # print() exercises the io protocol


def test_build_logger_writes_rotating_file(tmp_path, monkeypatch):
    import cambrian_tpu.utils as utils

    monkeypatch.setattr(utils, "LOGDIR", str(tmp_path))
    logger = build_logger("t-logger", "t.log")
    logger.info("a line for the file")
    for fh in utils._file_handlers.values():
        fh.flush()
    logged = (tmp_path / "t.log").read_text()
    assert "a line for the file" in logged
