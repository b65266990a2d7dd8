"""Probe the GSPMD partition of the SVA connector inside the train step.

The r5 TPU-topology buffer assignment of 13b_stage1 (docs/
production_compile_r5.jsonl) showed ~35 GiB of HLO temps dominated by fp32
[73728,8,128] K/V LayerNorm outputs being all-to-all'ed across the BATCH dim
— the partitioner reshards the 288 MB activations instead of all-gathering
the 2-4 MB projection weights, once per tower per k/v per sampler layer per
direction. This script reproduces the partition on the 8-device virtual CPU
mesh at reduced decoder depth (the SVA structure is what matters) and counts
the offending collectives in the compiled HLO, so sharding fixes can be
iterated in minutes instead of 20-minute TPU topology compiles.

Usage:  python scripts/perf/sva_shard_probe.py [num_layers]
"""

import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))


def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from cambrian_tpu.models.config import cambrian_13b
    from test_production_compile import _compile_train

    cfg = cambrian_13b().replace(
        scan_layers=True,
        num_hidden_layers=layers,
        # keep the in-LLM injection structure: stride 4 from layer 0
        num_of_vision_sampler_layers=max(1, layers // 4),
    )

    import test_production_compile as tpc
    captured = {}
    orig_record = tpc._record

    def record_and_keep(name, payload):
        captured.update(payload)
        return orig_record(name, payload)

    tpc._record = record_and_keep

    # _compile_train returns the payload; we need the compiled text, so
    # patch _mem_stats to stash the executable
    orig_mem = tpc._mem_stats
    exes = []

    def mem_and_keep(compiled):
        exes.append(compiled)
        return orig_mem(compiled)

    tpc._mem_stats = mem_and_keep

    _compile_train(cfg, (1, 8, 1), 8, stage1=True,
                   name=f"probe_13b_{layers}l")
    txt = exes[-1].as_text()

    a2a = re.findall(r"all-to-all[^\n]*", txt)
    big_f32 = sorted(set(re.findall(r"f32\[[0-9,]*(?:73728|147456|18432)[0-9,]*\]", txt)))
    print(f"\n== probe results ({layers} layers) ==")
    print(f"all-to-all ops in compiled HLO: {len(a2a)}")
    for line in a2a[:10]:
        print("   ", line[:160])
    print(f"fp32 tensors with ConvNeXt-bank dims: {big_f32[:10]}")
    n_ag = len(re.findall(r"all-gather", txt))
    n_rs = len(re.findall(r"reduce-scatter", txt))
    print(f"all-gather: {n_ag}  reduce-scatter: {n_rs}")


if __name__ == "__main__":
    main()
