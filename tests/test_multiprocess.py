"""Multi-host simulation: 2 processes x 4 virtual CPU devices run one real
sharded Cambrian train step over an 8-device global (data,fsdp,model) mesh.

This is the CPU stand-in for one-process-per-TPU-VM-worker launches
(reference docs/TPUs_Torch_XLA.md:153-163; our docs/TPUs_JAX.md).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CHILD = os.path.join(_REPO, "tests", "multiproc_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the child picks its own platform/flags; scrub the parent's test config
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=_REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: loss0=" in out and "OK" in out, out

    # both processes computed identical (replicated) global losses
    losses = [re.search(r"loss0=([\d.]+) loss1=([\d.]+)", o).groups()
              for o in outs]
    assert losses[0] == losses[1], losses


@pytest.mark.slow
def test_multiprocess_vs_single_process_loss_parity():
    """2-proc x 4-dev vs 1-proc x 8-dev over the SAME (2,2,2) global mesh:
    process partitioning must not change the training math (VERDICT r3
    item 9 — the driver-facing __graft_entry__.dryrun_multiprocess leg)."""
    sys.path.insert(0, _REPO)
    import __graft_entry__

    res = __graft_entry__.dryrun_multiprocess()  # asserts parity internally
    for a, b in zip(res["two_proc"], res["one_proc"]):
        assert abs(a - b) < 1e-3, res
