"""AOT-compile the PRODUCTION configs against their real meshes (VERDICT r2
item 1): nothing 8B/34B-shaped had ever been compiled against the
(data, fsdp, model) mesh — the multichip dryrun exercises a tiny 2-tower
debug config only. These tests lower + compile the real training step and the
real generation path at production shapes on the virtual CPU mesh (no
weights materialize: everything is ShapeDtypeStructs), then read
``compiled.memory_analysis()`` for per-device HBM and fail on any
spmd_partitioner reshard warning.

Geometry matches the launch scripts:
- 8B  (pretrain_cambrian_8b.sh):  mesh (data=1, fsdp=8, model=1), bs 8/device
- 34B (pretrain_cambrian_34b.sh): mesh (data=1, fsdp=2, model=4), bs 4/device
Stage-1 = tune_mm_mlp_adapter (connector-only Adam state, the launch-script
setting); stage-2 = full finetune (Adam over the decoder too).

Results are also appended to /tmp/production_compile.jsonl so the numbers can
be copied into docs/PERF_NOTES.md.

Interpretation caveat (recorded in PERF_NOTES too): on the CPU backend the
quantized matmul and flash attention fall back to XLA paths that materialize
dequantized weights / [S, S] logits, so ``temp_size_in_bytes`` OVERSTATES the
TPU-path activation workspace. ``argument_size_in_bytes`` (the sharded
params + optimizer + batch residency per device) is backend-faithful and is
what the HBM-fit asserts use; the single-chip serving config is additionally
AOT-compiled on the real TPU by scripts/bench runs for an authoritative
number.

Run one config standalone (background-friendly):
    python tests/test_production_compile.py 8b_stage1
"""

import json
import os
import sys
import time

import numpy as np
import pytest

if __name__ == "__main__" and not os.environ.get(
        "PRODUCTION_COMPILE_TOPOLOGY"):
    # standalone: conftest.py does this under pytest
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

if __name__ == "__main__" and not os.environ.get(
        "PRODUCTION_COMPILE_TOPOLOGY"):
    jax.config.update("jax_platforms", "cpu")


def _devices(n):
    """Devices for the AOT mesh. With PRODUCTION_COMPILE_TOPOLOGY set (e.g.
    "v5e:2x4"), abstract devices from a TPU topology descriptor: the REAL
    TPU compiler then does buffer assignment with the real kernels (Pallas
    attention, int8 matmul), so temp_size is TPU-faithful — measured r4;
    the CPU backend's temps overstate those paths (module docstring)."""
    topo = os.environ.get("PRODUCTION_COMPILE_TOPOLOGY")
    if topo:
        from jax.experimental import topologies
        devs = topologies.get_topology_desc(
            platform="tpu", topology_name=topo).devices
        assert len(devs) >= n, (topo, len(devs), n)
        return list(devs)[:n]
    return jax.devices()[:n]

V5E_HBM = 16 * 1024 ** 3  # bytes per v5e chip

# CPU-backend pytest runs scratch to /tmp; topology sweeps set
# PRODUCTION_COMPILE_RESULTS to a committed docs/ path (VERDICT r4 weak #7:
# the r4/r5 topology rows lived only in /tmp and were lost to a reboot).
RESULTS_PATH = os.environ.get("PRODUCTION_COMPILE_RESULTS",
                              "/tmp/production_compile.jsonl")


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _build_abstract(cfg, batch_size, seq_len=2048):
    """(model, towers, param_shapes, tower_param_shapes, batch_shapes) with
    every array a ShapeDtypeStruct — nothing big materializes."""
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.models.encoders.base import build_vision_tower_aux_list

    towers = build_vision_tower_aux_list(
        cfg.mm_vision_tower_aux_list, cfg.mm_vision_tower_aux_token_len_list,
        dtype=jnp.bfloat16,
    )
    model = CambrianLM(cfg, tuple(t.hidden_size for t in towers),
                       dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    tower_shapes = [jax.eval_shape(t.init, key) for t in towers]
    images = [
        _sds((batch_size, 3, t.image_size, t.image_size), jnp.float32)
        for t in towers
    ]
    feat_shapes = [
        jax.eval_shape(lambda tp, px, t=t: t.apply(tp, px), tp, px)
        for t, tp, px in zip(towers, tower_shapes, images)
    ]
    side = cfg.image_token_len_per_side
    aux_masks = [
        _sds((batch_size, cfg.image_token_len,
              (int(tok ** 0.5) // side) ** 2), jnp.bool_)
        for tok in cfg.mm_vision_tower_aux_token_len_list
    ]
    batch = dict(
        input_ids=_sds((batch_size, seq_len), jnp.int32),
        labels=_sds((batch_size, seq_len), jnp.int32),
        attention_mask=_sds((batch_size, seq_len), jnp.bool_),
        position_ids=_sds((batch_size, seq_len), jnp.int32),
        images=images,
        aux_masks=aux_masks,
    )
    param_shapes = jax.eval_shape(
        lambda ids, am, pos, feats, masks: model.init(key, ids, am, pos,
                                                      feats, masks),
        batch["input_ids"], batch["attention_mask"], batch["position_ids"],
        feat_shapes, aux_masks,
    )
    return model, towers, param_shapes, tower_shapes, batch


def _mem_stats(compiled):
    """Per-device byte stats from a compiled executable (may be partial on
    the CPU backend; missing fields come back as None)."""
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return {}
    if ma is None:
        return {}
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    if "argument_size_in_bytes" in out and "temp_size_in_bytes" in out:
        # peak live bytes during the step: args (params/opt/batch) + temps;
        # outputs alias donated inputs where possible (alias_size)
        out["peak_bytes"] = (
            out["argument_size_in_bytes"] + out["temp_size_in_bytes"]
            + out.get("output_size_in_bytes", 0)
            - out.get("alias_size_in_bytes", 0)
        )
        # backend-faithful residency: sharded params/opt/batch + non-aliased
        # outputs (CPU-backend temps overstate the TPU kernels' workspace)
        out["resident_bytes"] = (
            out["argument_size_in_bytes"]
            + out.get("output_size_in_bytes", 0)
            - out.get("alias_size_in_bytes", 0)
        )
    return out


def _record(name, payload):
    payload = {"config": name,
               "backend": os.environ.get("PRODUCTION_COMPILE_TOPOLOGY")
               or jax.default_backend(),
               **payload}
    with open(RESULTS_PATH, "a") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload), flush=True)
    return payload


def _tree_bytes(tree):
    return sum(
        int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
        for l in jax.tree.leaves(tree)
        if hasattr(l, "shape")
    )


# ---------------------------------------------------------------------------
# training-step compiles
# ---------------------------------------------------------------------------

def _compile_train(cfg, mesh_shape, per_device_bs, stage1, name,
                   donate=True, mu_dtype=None, accum=None):
    from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh
    from cambrian_tpu.parallel.sharding import infer_param_shardings
    from cambrian_tpu.train.optimizer import TrainConfig
    from cambrian_tpu.train.train_step import (
        batch_shardings, init_train_state, make_train_step, state_shardings,
    )

    data_ax, fsdp_ax, model_ax = mesh_shape
    n_dev = data_ax * fsdp_ax * model_ax
    mesh = create_mesh(MeshConfig(data=data_ax, fsdp=fsdp_ax, model=model_ax),
                       devices=_devices(n_dev))
    batch_size = per_device_bs * data_ax * fsdp_ax

    t0 = time.time()
    model, towers, param_shapes, tower_shapes, batch = _build_abstract(
        cfg, batch_size)

    tconf = TrainConfig(learning_rate=1e-3, mm_vision_sampler_lr=1e-4,
                        total_steps=1000, tune_mm_mlp_adapter=stage1,
                        adam_mu_dtype=mu_dtype)
    if stage1:
        # the trainer stores frozen params bf16 (optimizer.cast_frozen_params;
        # norm scales/biases exempt — they are applied in fp32)
        from cambrian_tpu.train.optimizer import _NORM_PATH_RE, label_params
        labels = label_params(param_shapes, tconf)

        def _cast(path, s, l):
            comps = [getattr(k, "key", getattr(k, "name", str(k)))
                     for k in path]
            if (l == "frozen" and s.dtype == jnp.float32
                    and not any(_NORM_PATH_RE.search(c) for c in comps)):
                return _sds(s.shape, jnp.bfloat16)
            return s

        param_shapes = jax.tree_util.tree_map_with_path(
            _cast, param_shapes, labels)
    state_shapes = jax.eval_shape(
        lambda p: init_train_state(p, tconf), param_shapes)
    # eval_shape erases the static tx; rebuild the real one for the step fn
    from cambrian_tpu.train.train_step import TrainState
    from cambrian_tpu.train.optimizer import build_optimizer
    tx, _ = build_optimizer(param_shapes, tconf)
    if accum and accum > 1:
        # accumulation-faithful: the trainer wraps tx in optax.MultiSteps
        # (trainer.py:311), whose state adds a params-sized fp32 grad
        # accumulator — a real share of the per-device argument budget the
        # unwrapped compile understates
        import optax

        tx = optax.MultiSteps(tx, accum)
        opt_shapes = jax.eval_shape(tx.init, param_shapes)
        state_shapes = jax.eval_shape(
            lambda p, o: TrainState(step=jnp.zeros((), jnp.int32), params=p,
                                    opt_state=o, tx=None),
            param_shapes, opt_shapes)
    state_shapes = TrainState(step=state_shapes.step,
                              params=state_shapes.params,
                              opt_state=state_shapes.opt_state, tx=tx)

    step_fn = make_train_step(model, towers, freeze=tconf)
    state_sh = state_shardings(state_shapes, mesh)
    tower_sh = [infer_param_shardings(tp, mesh) for tp in tower_shapes]
    batch_sh = batch_shardings(mesh, num_towers=len(towers))

    with jax.set_mesh(mesh):
        jstep = jax.jit(
            step_fn,
            in_shardings=(state_sh, tower_sh, batch_sh),
            out_shardings=(state_sh, None),
            donate_argnums=(0,) if donate else (),
        )
        lowered = jstep.lower(state_shapes, tower_sh and tower_shapes, batch)
        t_lower = time.time() - t0
        t1 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t1

    stats = _mem_stats(compiled)
    payload = {
        "kind": "train",
        "mesh": {"data": data_ax, "fsdp": fsdp_ax, "model": model_ax},
        "global_batch": batch_size,
        "stage": "stage1_adapter" if stage1 else "stage2_full",
        "scan_layers": bool(cfg.scan_layers),
        "trace_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "param_bytes_total": _tree_bytes(param_shapes),
        "opt_bytes_total": _tree_bytes(state_shapes.opt_state),
        "tower_bytes_total": sum(_tree_bytes(tp) for tp in tower_shapes),
        **stats,
    }
    return _record(name, payload)


# ---------------------------------------------------------------------------
# generation-path compiles (prefill + decode_step, engine shardings)
# ---------------------------------------------------------------------------

def _compile_generate(cfg, mesh_shape, batch_size, name, max_len=1024,
                      prompt_len=704):
    from cambrian_tpu.models.cambrian import CambrianLM
    from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh
    from cambrian_tpu.parallel.sharding import infer_param_shardings
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_ax, fsdp_ax, model_ax = mesh_shape
    n_dev = data_ax * fsdp_ax * model_ax
    mesh = None
    if n_dev > 1:
        mesh = create_mesh(
            MeshConfig(data=data_ax, fsdp=fsdp_ax, model=model_ax),
            devices=_devices(n_dev))

    t0 = time.time()
    model, towers, param_shapes, tower_shapes, batch = _build_abstract(
        cfg, batch_size, seq_len=prompt_len)
    # serving loads big float tensors as bf16 (checkpoint dtype); model.init's
    # abstract tree carries fp32 param storage, so cast for a faithful budget
    param_shapes = jax.tree.map(
        lambda s: _sds(s.shape, jnp.bfloat16)
        if s.dtype == jnp.float32 and np.prod(s.shape) > 1 << 20 else s,
        param_shapes,
    )

    kvh, hd = cfg.num_key_value_heads, cfg.head_dim
    cache_shapes = tuple(
        (_sds((batch_size, max_len, kvh, hd), jnp.bfloat16),
         _sds((batch_size, max_len, kvh, hd), jnp.bfloat16))
        for _ in range(cfg.num_hidden_layers)
    )
    feat_shapes = [
        jax.eval_shape(lambda tp, px, t=t: t.apply(tp, px), tp, px)
        for t, tp, px in zip(towers, tower_shapes, batch["images"])
    ]

    if mesh is not None:
        param_sh = infer_param_shardings(param_shapes, mesh)
        kv_spec = P(None, None,
                    "model" if kvh % model_ax == 0 else None, None)
        cache_sh = jax.tree.map(
            lambda _: NamedSharding(mesh, kv_spec), cache_shapes,
            is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))
    else:
        param_sh = cache_sh = None

    def prefill(params, ids, amask, pos, cache, feats, aux_masks):
        return model.apply(params, ids, amask, pos, cache, feats, aux_masks,
                           method=CambrianLM.prefill)

    def decode(params, tok, pos, cache, cache_valid, cache_index):
        return model.apply(params, tok, pos, cache, cache_valid, cache_index,
                           method=CambrianLM.decode_step)

    import contextlib
    ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with ctx:
        jp = jax.jit(prefill,
                     in_shardings=(param_sh, None, None, None, cache_sh,
                                   None, None) if mesh else None)
        lowered_p = jp.lower(param_shapes, batch["input_ids"],
                             batch["attention_mask"], batch["position_ids"],
                             cache_shapes, feat_shapes, batch["aux_masks"])
        compiled_p = lowered_p.compile()
        t_prefill = time.time() - t0

        t1 = time.time()
        jd = jax.jit(decode,
                     in_shardings=(param_sh, None, None, cache_sh, None,
                                   None) if mesh else None,
                     donate_argnums=(3,))
        lowered_d = jd.lower(
            param_shapes, _sds((batch_size, 1), jnp.int32),
            _sds((batch_size, 1), jnp.int32), cache_shapes,
            _sds((batch_size, max_len), jnp.bool_), _sds((), jnp.int32))
        compiled_d = lowered_d.compile()
        t_decode = time.time() - t1

    payload = {
        "kind": "generate",
        "mesh": {"data": data_ax, "fsdp": fsdp_ax, "model": model_ax},
        "batch": batch_size,
        "quantize": cfg.quantize,
        "scan_layers": bool(cfg.scan_layers),
        "prefill_compile_s": round(t_prefill, 1),
        "decode_compile_s": round(t_decode, 1),
        "param_bytes_total": _tree_bytes(param_shapes),
        "prefill": _mem_stats(compiled_p),
        "decode": _mem_stats(compiled_d),
    }
    return _record(name, payload)


# ---------------------------------------------------------------------------
# the configs (launch-script geometry)
# ---------------------------------------------------------------------------

def _cfg_8b(**kw):
    from cambrian_tpu.models.config import cambrian_8b
    return cambrian_8b().replace(**kw)


def _cfg_13b(**kw):
    from cambrian_tpu.models.config import cambrian_13b
    return cambrian_13b().replace(**kw)


def _cfg_34b(**kw):
    from cambrian_tpu.models.config import cambrian_34b
    # builder.py auto-enables scan_layers for >=40-layer checkpoints
    return cambrian_34b().replace(scan_layers=True, **kw)


CONFIGS = {
    "8b_stage1": lambda: _compile_train(
        _cfg_8b(), (1, 8, 1), 8, stage1=True, name="8b_stage1"),
    "8b_stage2": lambda: _compile_train(
        _cfg_8b(), (1, 8, 1), 8, stage1=False, name="8b_stage2"),
    # the launch script's v5e-8 geometry after the r4 TPU memory finding:
    # bs 2/device (+4x grad accumulation outside this compile), bf16 Adam mu
    "8b_stage2_bs2": lambda: _compile_train(
        _cfg_8b(), (1, 8, 1), 2, stage1=False, name="8b_stage2_bs2",
        mu_dtype="bfloat16"),
    # scan_layers variant: the r5 topology run measured the UNROLLED bs2
    # step at 21.13 GB — dominated by ~32 concurrently-live 112 MB per-layer
    # remat buffers (the latency-hiding scheduler overlaps every layer's
    # fsdp all-gather + rematted recompute). lax.scan serializes the
    # backward per 3-layer injection segment, bounding that working set.
    "8b_stage2_bs2_scan": lambda: _compile_train(
        _cfg_8b(scan_layers=True), (1, 8, 1), 2, stage1=False,
        name="8b_stage2_bs2_scan", mu_dtype="bfloat16"),
    "8b_stage2_bs1_scan": lambda: _compile_train(
        _cfg_8b(scan_layers=True), (1, 8, 1), 1, stage1=False,
        name="8b_stage2_bs1_scan", mu_dtype="bfloat16"),
    # v5e-16 geometry (PRODUCTION_COMPILE_TOPOLOGY=v5e:4x4): fsdp=16 halves
    # the fp32 Adam residency (~5.5 GB/device), bs 4/device keeps global 64
    "8b_stage2_bs4_v16": lambda: _compile_train(
        _cfg_8b(scan_layers=True), (1, 16, 1), 4, stage1=False,
        name="8b_stage2_bs4_v16", mu_dtype="bfloat16"),
    "8b_stage2_bs2_v16": lambda: _compile_train(
        _cfg_8b(scan_layers=True), (1, 16, 1), 2, stage1=False,
        name="8b_stage2_bs2_v16", mu_dtype="bfloat16"),
    # accumulation-faithful candidate geometries (global 64 per optimizer
    # step, like finetune_cambrian_8b.sh): MultiSteps' fp32 accumulator is
    # in the argument budget here
    "8b_stage2_bs1_accum4_v16": lambda: _compile_train(
        _cfg_8b(scan_layers=True), (1, 16, 1), 1, stage1=False,
        name="8b_stage2_bs1_accum4_v16", mu_dtype="bfloat16", accum=4),
    "8b_stage2_bs2_accum2_v16": lambda: _compile_train(
        _cfg_8b(scan_layers=True), (1, 16, 1), 2, stage1=False,
        name="8b_stage2_bs2_accum2_v16", mu_dtype="bfloat16", accum=2),
    # v5e-32 (4x8): global 64 with no accumulation
    "8b_stage2_bs2_v32": lambda: _compile_train(
        _cfg_8b(scan_layers=True), (1, 32, 1), 2, stage1=False,
        name="8b_stage2_bs2_v32", mu_dtype="bfloat16"),
    # 13B (pretrain/finetune_cambrian_13b.sh): BASELINE config #3 — same
    # (1,8,1) mesh as 8B, Vicuna geometry (image_position 35, stride 4)
    "13b_stage1": lambda: _compile_train(
        _cfg_13b(scan_layers=True), (1, 8, 1), 8, stage1=True,
        name="13b_stage1"),
    # fallback geometry if bs8 exceeds HBM: per-device bs 4 + 2x grad
    # accumulation preserves the launch script's global 64 per optimizer step
    "13b_stage1_bs4": lambda: _compile_train(
        _cfg_13b(scan_layers=True), (1, 8, 1), 4, stage1=True,
        name="13b_stage1_bs4"),
    "13b_serve_int4": lambda: _compile_generate(
        _cfg_13b(quantize="int4", scan_layers=True), (1, 1, 1), 1,
        name="13b_serve_int4"),
    "34b_stage1": lambda: _compile_train(
        _cfg_34b(), (1, 2, 4), 4, stage1=True, name="34b_stage1"),
    "34b_stage1_bs2": lambda: _compile_train(
        _cfg_34b(), (1, 2, 4), 2, stage1=True, name="34b_stage1_bs2"),
    "34b_stage2": lambda: _compile_train(
        _cfg_34b(), (1, 2, 4), 4, stage1=False, name="34b_stage2"),
    "8b_serve_int8": lambda: _compile_generate(
        _cfg_8b(quantize="int8"), (1, 1, 1), 1, name="8b_serve_int8"),
    "34b_serve": lambda: _compile_generate(
        _cfg_34b(), (1, 2, 4), 1, name="34b_serve"),
    # full-34B int4 single-host serving (PERF_NOTES r4: 18.3 GiB of int4
    # weights can't fit one chip; this is the real deployment geometry).
    # Under a >1-device mesh the quant matmuls take the XLA dequant path
    # (ops/quant.py::_under_multidevice_mesh) — GSPMD shards it freely.
    "34b_serve_int4": lambda: _compile_generate(
        _cfg_34b(quantize="int4"), (1, 2, 4), 1, name="34b_serve_int4"),
}


# ---------------------------------------------------------------------------
# pytest wrappers
# ---------------------------------------------------------------------------

pytestmark = pytest.mark.slow


def _assert_no_reshard_warnings(captured_err: str):
    for line in captured_err.splitlines():
        low = line.lower()
        if "spmd_partitioner" in low or "resharding" in low:
            raise AssertionError(f"partitioner reshard warning: {line}")


@pytest.mark.parametrize("name", ["8b_stage1", "8b_serve_int8",
                                  "13b_stage1", "13b_serve_int4"])
def test_production_compile_fits_v5e(name, capfd):
    """The single-chip-serving and stage-1-training configs must fit v5e HBM
    per device (the documented bf16-compute / fp32-Adam budget). The fit
    assert uses backend-faithful resident bytes (sharded params/opt/batch/
    outputs); CPU-backend temps are recorded but overstate the TPU kernels'
    workspace (see module docstring)."""
    payload = CONFIGS[name]()
    _assert_no_reshard_warnings(capfd.readouterr().err)
    resident = payload.get("resident_bytes") or payload.get(
        "prefill", {}).get("resident_bytes")
    assert resident is not None, f"no memory_analysis: {payload}"
    assert resident < V5E_HBM, (
        f"{name}: per-device residency {resident / 1e9:.1f} GB exceeds "
        f"v5e 16 GB")


@pytest.mark.parametrize("name", ["34b_stage1", "34b_serve"])
def test_production_compile_34b(name, capfd):
    """34B on the launch script's (1,2,4) mesh: must compile cleanly AND fit
    v5e per-device residency. Stage-1 fits only because frozen params are
    stored bf16 (optimizer.cast_frozen_params — fp32 storage measured
    20.1 GB/device, r3 AOT run); serving params shard over fsdp x model."""
    payload = CONFIGS[name]()
    _assert_no_reshard_warnings(capfd.readouterr().err)
    resident = payload.get("resident_bytes") or payload.get(
        "prefill", {}).get("resident_bytes")
    assert resident is not None and resident < V5E_HBM, (
        f"{name}: {resident and resident / 1e9:.1f} GB per device")


def test_8b_stage2_records_budget(capfd):
    """Full-finetune 8B: Adam-over-everything. Recorded (the per-device
    requirement documents the minimum slice for stage-2), asserted only to
    compile cleanly and to be within 2x of the analytic estimate."""
    payload = CONFIGS["8b_stage2"]()
    _assert_no_reshard_warnings(capfd.readouterr().err)
    resident = payload.get("resident_bytes")
    if resident is None:
        pytest.skip("backend lacks memory_analysis")
    analytic = (payload["param_bytes_total"] + payload["opt_bytes_total"]
                + payload["tower_bytes_total"]) / 8
    assert resident > 0.5 * analytic, "implausibly small measured footprint"


def _record_compile_failure(name, exc):
    """Durable jsonl row for a failed topology compile (VERDICT r4 weak #7:
    the r4 70 GB RESOURCE_EXHAUSTED finding lived only in PERF_NOTES prose).
    Parses the TPU compiler's HBM accounting out of the error text."""
    import re

    msg = str(exc)
    rec = {"kind": "topology_compile_failure",
           "topology": os.environ.get("PRODUCTION_COMPILE_TOPOLOGY"),
           "error": type(exc).__name__}
    m = re.search(r"Used ([0-9.]+)([GMK]) of ([0-9.]+)([GMK]) hbm", msg)
    scale = {"K": 1 / 1024 ** 2, "M": 1 / 1024, "G": 1.0}
    if m:
        rec["hbm_used_gib"] = round(float(m.group(1)) * scale[m.group(2)], 2)
        rec["hbm_limit_gib"] = round(float(m.group(3)) * scale[m.group(4)], 2)
    m = re.search(r"HLO temp\s+([0-9.]+)([GMK])", msg)
    if m:
        rec["hlo_temp_gib"] = round(float(m.group(1)) * scale[m.group(2)], 2)
    allocs = re.findall(
        r"\d+\. Size: ([0-9.]+[GMK])\s*\n(?:\s*Operator: op_name=\"([^\"]*)\".*\n)?"
        r"\s*Shape: (\S+)", msg)
    rec["largest_allocations"] = [
        {"size": s, "op": op[:160], "shape": shape}
        for s, op, shape in allocs[:8]]
    return _record(name, rec)


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    bad = []
    for n in names:
        print(f"== {n} ==", flush=True)
        try:
            payload = CONFIGS[n]()
        except Exception as e:  # noqa: BLE001 — record, report, move on
            _record_compile_failure(n, e)
            print(f"{n}: COMPILE FAILED: {str(e)[:400]}", flush=True)
            bad.append(n)
            continue
        if os.environ.get("PRODUCTION_COMPILE_TOPOLOGY"):
            # real-TPU-compiler buffer assignment: peak (args + temps +
            # non-aliased outputs) is the authoritative fit answer the CPU
            # backend can't give (module docstring).
            peaks = [d.get("peak_bytes")
                     for d in (payload, payload.get("prefill", {}),
                               payload.get("decode", {}))
                     if d.get("peak_bytes") is not None]
            peak = max(peaks) if peaks else None
            if peak is None:
                print(f"{n}: no peak_bytes from topology compile", flush=True)
                bad.append(n)
            else:
                fit = peak < V5E_HBM
                print(f"{n}: TPU-compiler peak {peak / 2**30:.2f} GiB "
                      f"per device -> {'FITS' if fit else 'OVER'} v5e 16 GiB",
                      flush=True)
                if not fit:
                    bad.append(n)
    if bad:
        sys.exit(f"configs over budget or unmeasured: {bad}")
