"""Continuous batching must reproduce the sequential engine's greedy outputs
while serving multiple requests through one shared cache."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from util import make_tiny_checkpoint  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from cambrian_tpu.infer.continuous import ContinuousBatchingEngine  # noqa: E402
from cambrian_tpu.infer.engine import GenerationConfig, GenerationEngine  # noqa: E402
from cambrian_tpu.models.builder import load_pretrained_model  # noqa: E402


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cb_ckpt"))
    make_tiny_checkpoint(path)
    tokenizer, model, processors, _ = load_pretrained_model(path)
    return tokenizer, model


def _mk_prompt(tokenizer, text):
    ids = np.asarray(tokenizer(text).input_ids, dtype=np.int32)[None]
    mask = np.ones_like(ids, dtype=bool)
    pos = np.tile(np.arange(ids.shape[1]), (1, 1))
    return ids, mask, pos


def test_continuous_matches_sequential(bundle):
    tokenizer, model = bundle
    prompts = [
        "a cat sat on the mat",
        "describe the picture please user",
        "hello world what is in this image today",
    ]
    cfg = GenerationConfig(max_new_tokens=5, temperature=0.0)

    seq_engine = GenerationEngine(model.lm, model.params, model.towers,
                                  max_len=256, cache_dtype=jnp.float32)
    expected = []
    for p in prompts:
        ids, mask, pos = _mk_prompt(tokenizer, p)
        expected.append(seq_engine.generate(ids, mask, pos, None, None, cfg)[0])

    cb = ContinuousBatchingEngine(model.lm, model.params, num_slots=2,
                                  max_len=256, cache_dtype=jnp.float32)
    reqs = []
    for p in prompts:
        ids, mask, pos = _mk_prompt(tokenizer, p)
        reqs.append(cb.submit(ids, mask, pos, config=cfg))
    outs = cb.run_until_complete(reqs)

    for out, exp in zip(outs, expected):
        np.testing.assert_array_equal(out, np.asarray(exp))


def test_slots_are_reused(bundle):
    tokenizer, model = bundle
    cfg = GenerationConfig(max_new_tokens=3, temperature=0.0)
    cb = ContinuousBatchingEngine(model.lm, model.params, num_slots=1,
                                  max_len=128, cache_dtype=jnp.float32)
    reqs = []
    for p in ["a cat", "the mat", "hello world"]:
        ids, mask, pos = _mk_prompt(tokenizer, p)
        reqs.append(cb.submit(ids, mask, pos, config=cfg))
    outs = cb.run_until_complete(reqs)
    assert all(len(o) == 3 for o in outs)
    assert all(r.finished for r in reqs)


def test_streaming_callback(bundle):
    tokenizer, model = bundle
    cfg = GenerationConfig(max_new_tokens=4, temperature=0.0)
    cb = ContinuousBatchingEngine(model.lm, model.params, num_slots=2,
                                  max_len=128, cache_dtype=jnp.float32)
    seen = []
    ids, mask, pos = _mk_prompt(tokenizer, "a cat sat")
    req = cb.submit(ids, mask, pos, config=cfg, on_token=seen.append)
    cb.run_until_complete([req])
    assert seen == req.tokens and len(seen) == 4


def test_on_device_generation_matches_host_loop(bundle):
    tokenizer, model = bundle
    cfg = GenerationConfig(max_new_tokens=6, temperature=0.0)
    seq = GenerationEngine(model.lm, model.params, model.towers,
                           max_len=256, cache_dtype=jnp.float32)
    ids, mask, pos = _mk_prompt(tokenizer, "hello world what is in")
    host = seq.generate(ids, mask, pos, None, None, cfg, on_device=False)
    dev = seq.generate(ids, mask, pos, None, None, cfg, on_device=True)
    np.testing.assert_array_equal(host, dev)


def test_sharded_inference_matches_unsharded(bundle):
    """TP+FSDP inference: same greedy outputs on a (1,2,2) mesh."""
    import jax

    from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh

    tokenizer, model = bundle
    mesh = create_mesh(MeshConfig(data=1, fsdp=2, model=2),
                       devices=jax.devices()[:4])
    cfg = GenerationConfig(max_new_tokens=5, temperature=0.0)
    ids, mask, pos = _mk_prompt(tokenizer, "a cat sat on the mat")

    plain = GenerationEngine(model.lm, model.params, max_len=128,
                             cache_dtype=jnp.float32)
    sharded = GenerationEngine(model.lm, model.params, max_len=128,
                               cache_dtype=jnp.float32, mesh=mesh)
    with jax.set_mesh(mesh):
        out_sharded = sharded.generate(ids, mask, pos, None, None, cfg)
    out_plain = plain.generate(ids, mask, pos, None, None, cfg)
    np.testing.assert_array_equal(out_plain, out_sharded)


def test_sliding_window_host_device_parity(bundle):
    """Sliding-window cache retirement must behave identically in the host
    loop and the on-device loop (generation long enough to exceed the
    window)."""
    import dataclasses

    from cambrian_tpu.models.cambrian import CambrianLM

    tokenizer, model = bundle
    cfg_w = model.config.replace(sliding_window=8)
    lm = CambrianLM(cfg_w, model.lm.tower_hidden_sizes)
    engine = GenerationEngine(lm, model.params, max_len=128,
                              cache_dtype=jnp.float32)
    ids, mask, pos = _mk_prompt(tokenizer, "a cat sat on the mat today")
    gcfg = GenerationConfig(max_new_tokens=12, temperature=0.0)
    host = engine.generate(ids, mask, pos, None, None, gcfg, on_device=False)
    dev = engine.generate(ids, mask, pos, None, None, gcfg, on_device=True)
    np.testing.assert_array_equal(host, dev)


def test_chunked_matches_per_token(bundle):
    """step_chunk(N) must produce the same greedy tokens as per-token
    stepping, including slot reuse and mixed prompt lengths."""
    tokenizer, model = bundle
    prompts = [
        "a cat sat on the mat",
        "describe the picture please user",
        "hello world what is in this image today",
    ]
    cfg = GenerationConfig(max_new_tokens=7, temperature=0.0)

    def run(chunk):
        cb = ContinuousBatchingEngine(model.lm, model.params, num_slots=2,
                                      max_len=256, cache_dtype=jnp.float32)
        reqs = []
        for p in prompts:
            ids, mask, pos = _mk_prompt(tokenizer, p)
            reqs.append(cb.submit(ids, mask, pos, config=cfg))
        return cb.run_until_complete(reqs, chunk=chunk)

    per_token = run(1)
    chunked = run(4)
    for a, b in zip(per_token, chunked):
        np.testing.assert_array_equal(a, b)


def test_chunked_eos_mid_chunk(bundle):
    """A slot hitting eos inside a chunk stops exactly there; the other slot
    keeps decoding to its budget."""
    tokenizer, model = bundle
    ids, mask, pos = _mk_prompt(tokenizer, "a cat sat on the mat")

    cb0 = ContinuousBatchingEngine(model.lm, model.params, num_slots=2,
                                   max_len=128, cache_dtype=jnp.float32)
    probe = cb0.submit(ids, mask, pos,
                       config=GenerationConfig(max_new_tokens=8,
                                               temperature=0.0))
    full = cb0.run_until_complete([probe], chunk=4)[0]
    # pretend one generated token is eos — it must be the FIRST occurrence of
    # that id (the tiny model loops tokens, so e.g. full[2] may equal full[0]
    # and eos would legitimately fire earlier), and sit strictly inside a
    # chunk (not at j=0) to exercise mid-chunk stopping.
    k = next(i for i in range(1, 8)
             if int(full[i]) not in full[:i].tolist() and i % 4 != 0)
    eos = int(full[k])

    cb = ContinuousBatchingEngine(model.lm, model.params, num_slots=2,
                                  max_len=128, cache_dtype=jnp.float32)
    r_eos = cb.submit(ids, mask, pos, config=GenerationConfig(
        max_new_tokens=8, temperature=0.0, eos_token_id=eos))
    ids2, mask2, pos2 = _mk_prompt(tokenizer, "hello world today")
    r_full = cb.submit(ids2, mask2, pos2, config=GenerationConfig(
        max_new_tokens=6, temperature=0.0))
    outs = cb.run_until_complete([r_eos, r_full], chunk=4)
    assert len(outs[0]) == k + 1 and int(outs[0][-1]) == eos
    assert len(outs[1]) == 6
    np.testing.assert_array_equal(outs[0], full[:k + 1])


def test_chunked_mixed_sampling_configs(bundle):
    """Per-slot temperatures in one chunk: the greedy slot is token-exact
    while the sampled slot draws valid tokens."""
    tokenizer, model = bundle
    ids, mask, pos = _mk_prompt(tokenizer, "a cat sat on the mat")
    ids2, mask2, pos2 = _mk_prompt(tokenizer, "hello world today")

    seq = GenerationEngine(model.lm, model.params, model.towers,
                           max_len=128, cache_dtype=jnp.float32)
    greedy_ref = seq.generate(ids, mask, pos, None, None,
                              GenerationConfig(max_new_tokens=6,
                                               temperature=0.0))[0]

    cb = ContinuousBatchingEngine(model.lm, model.params, num_slots=2,
                                  max_len=128, cache_dtype=jnp.float32)
    r_greedy = cb.submit(ids, mask, pos, config=GenerationConfig(
        max_new_tokens=6, temperature=0.0))
    r_sample = cb.submit(ids2, mask2, pos2, config=GenerationConfig(
        max_new_tokens=6, temperature=0.9, top_p=0.9, seed=3))
    outs = cb.run_until_complete([r_greedy, r_sample], chunk=3)
    np.testing.assert_array_equal(outs[0], np.asarray(greedy_ref))
    assert len(outs[1]) == 6
    assert all(0 <= t < model.config.vocab_size for t in outs[1])


def test_chunked_capacity_capped_slot_does_not_degrade_batch(bundle):
    """A slot within one token of max_len caps only ITSELF (via its per-slot
    remaining budget) while co-scheduled slots keep the full chunk width
    (ADVICE r2: the old min-over-slots headroom degraded everyone to
    per-token). The capped slot force-retires at capacity; the other slot's
    tokens are unaffected."""
    tokenizer, model = bundle
    rng = np.random.default_rng(7)
    s1, s2 = 30, 10

    def prompt(n):
        ids = rng.integers(5, model.config.vocab_size, (1, n)).astype(np.int32)
        return ids, np.ones_like(ids, bool), np.arange(n)[None].astype(np.int32)

    ids, mask, pos = prompt(s1)
    ids2, mask2, pos2 = prompt(s2)

    # reference: the short-capacity request alone at a roomy max_len
    ref_engine = GenerationEngine(model.lm, model.params, model.towers,
                                  max_len=128, cache_dtype=jnp.float32)
    ref_long = ref_engine.generate(
        ids2, mask2, pos2, None, None,
        GenerationConfig(max_new_tokens=10, temperature=0.0))[0]

    # max_len leaves slot-1 only 3 cache writes of headroom; slot-2 has room
    max_len = s1 + 3
    cb = ContinuousBatchingEngine(model.lm, model.params, num_slots=2,
                                  max_len=max_len, cache_dtype=jnp.float32)
    r_capped = cb.submit(ids, mask, pos, config=GenerationConfig(
        max_new_tokens=10, temperature=0.0))
    r_free = cb.submit(ids2, mask2, pos2, config=GenerationConfig(
        max_new_tokens=10, temperature=0.0))
    outs = cb.run_until_complete([r_capped, r_free], chunk=4)

    assert len(outs[0]) == max_len - s1  # capacity-capped, force-retired
    assert r_capped.finished
    assert len(outs[1]) == 10
    np.testing.assert_array_equal(outs[1], np.asarray(ref_long)[: len(outs[1])])
