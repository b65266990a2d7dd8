"""Logging and misc utilities (reference: cambrian/utils.py).

The reference's ``IS_XLA_AVAILABLE`` flag forked the whole model core into
training (static-shape) and inference (dynamic) paths; this framework has one
static-shape path, so no such flag exists here.
"""

import logging
import logging.handlers
import os
import sys

LOGDIR = os.environ.get("CAMBRIAN_LOGDIR", ".")

server_error_msg = (
    "**NETWORK ERROR DUE TO HIGH TRAFFIC. PLEASE REGENERATE OR REFRESH THIS PAGE.**"
)
moderation_msg = (
    "YOUR INPUT VIOLATES OUR CONTENT MODERATION GUIDELINES. PLEASE TRY AGAIN."
)

_FMT = logging.Formatter(
    "%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
)
_file_handlers = {}  # one shared rotating handler per log file


def build_logger(logger_name, logger_filename):
    """Named INFO logger that also appends to a daily-rotating log file.

    Serves the role of the reference's logger factory (cambrian/utils.py:25)
    with a simpler mechanism: rather than walking every registered logger to
    bolt the file handler on, the handler goes on the ROOT logger once and
    record propagation delivers every namespace to it.
    """
    root = logging.getLogger()
    if not root.handlers:
        console = logging.StreamHandler()
        root.addHandler(console)
        root.setLevel(logging.INFO)
    for h in root.handlers:
        h.setFormatter(_FMT)

    if logger_filename not in _file_handlers:
        os.makedirs(LOGDIR, exist_ok=True)
        fh = logging.handlers.TimedRotatingFileHandler(
            os.path.join(LOGDIR, logger_filename),
            when="D", utc=True, encoding="utf-8",
        )
        fh.setFormatter(_FMT)
        root.addHandler(fh)
        _file_handlers[logger_filename] = fh

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    return logger


class StreamToLogger:
    """Fake file-like stream that redirects writes to a logger
    (reference cambrian/utils.py:68-98)."""

    def __init__(self, logger, log_level=logging.INFO):
        self.terminal = sys.stdout
        self.logger = logger
        self.log_level = log_level
        self.linebuf = ""

    def __getattr__(self, attr):
        return getattr(self.terminal, attr)

    def write(self, buf):
        temp_linebuf = self.linebuf + buf
        self.linebuf = ""
        for line in temp_linebuf.splitlines(True):
            if line[-1] == "\n":
                self.logger.log(self.log_level, line.rstrip())
            else:
                self.linebuf += line

    def flush(self):
        if self.linebuf != "":
            self.logger.log(self.log_level, self.linebuf.rstrip())
        self.linebuf = ""


def disable_torch_init():
    """No-op kept for API parity (reference cambrian/utils.py:101-108).

    JAX modules have explicit initializers; there is nothing to disable."""
    return None


def violates_moderation(text):
    """OpenAI moderation hook used by the Gradio server
    (reference cambrian/utils.py:111-126). Returns False when no API key or
    network is available."""
    import json

    api_key = os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return False
    try:
        import requests

        url = "https://api.openai.com/v1/moderations"
        headers = {
            "Content-Type": "application/json",
            "Authorization": "Bearer " + api_key,
        }
        text = text.replace("\n", "")
        data = json.dumps({"input": text}).encode("utf-8")
        ret = requests.post(url, headers=headers, data=data, timeout=5)
        return ret.json()["results"][0]["flagged"]
    except Exception:
        return False


def pretty_print_semaphore(semaphore):
    if semaphore is None:
        return "None"
    return f"Semaphore(value={semaphore._value}, locked={semaphore.locked()})"
