"""The SVA connector must stay batch-local under the training mesh.

r5 TPU-topology finding (docs/production_compile_r5.jsonl, 13b_stage1):
GSPMD resharded the fp32 K/V-LayerNorm window activations across devices
(an all-to-all per tower per k/v per sampler layer per direction) to match
the 2-4 MB fsdp-sharded projection weights — ~35 GiB of HLO temps. With
batch sharding pinned through every SVA projection (models/sva.py::_flat,
ops/attention.py::windowed_cross_attention), the projections compute
locally and those buffers vanish. This compiles a reduced-depth 13B
stage-1 step on the 8-device mesh and asserts no ConvNeXt-bank-sized
tensor rides an all-to-all (remaining all-to-alls are tower-internal conv
resharding, a documented second-order term — ROADMAP.md).
"""

import re
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(__file__))

pytestmark = pytest.mark.slow

# per-device ConvNeXt-bank row counts at global bs 64 on 8 devices:
# 8 (local batch) x 9216 bank tokens, and the half/quarter splits
BANK_DIMS = ("73728", "147456", "36864")


def test_sva_activations_not_resharded():
    from cambrian_tpu.models.config import cambrian_13b
    import test_production_compile as tpc

    cfg = cambrian_13b().replace(
        scan_layers=True, num_hidden_layers=8,
        num_of_vision_sampler_layers=2,
    )
    exes = []
    orig = tpc._mem_stats

    def keep(compiled):
        exes.append(compiled)
        return orig(compiled)

    tpc._mem_stats = keep
    try:
        tpc._compile_train(cfg, (1, 8, 1), 8, stage1=True,
                           name="sva_locality_probe")
    finally:
        tpc._mem_stats = orig
    txt = exes[-1].as_text()

    offending = [
        ln.strip()[:160] for ln in txt.splitlines()
        if "all-to-all" in ln and any(d in ln for d in BANK_DIMS)
    ]
    assert not offending, offending
    # and the fp32 reshard materializations themselves are gone
    assert not re.search(r"f32\[(?:1,)?73728,(?:8,)?128\]", txt)
