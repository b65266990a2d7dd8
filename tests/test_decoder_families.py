"""Logit parity of the non-llama decoder families (Phi-3, Mistral, Gemma,
Cohere — reference cambrian/model/language_model/*) vs HF torch models with
random weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cambrian_tpu.checkpoint.hf_llm import convert_decoder
from cambrian_tpu.models.cambrian import CambrianLM
from cambrian_tpu.models.config import CambrianConfig

RNG = np.random.default_rng(9)

_COMMON_VISION = dict(
    mm_vision_tower_aux_list=("debug-tower-0",),
    mm_vision_tower_aux_token_len_list=(16,),
    query_num_list=(16,), image_token_len=16, num_query_group=1,
    connector_only=True, vision_hidden_size=32,
)


def _run_parity(hf_model, cfg, atol=1e-4, seq=12):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    model = CambrianLM(cfg, (32,))
    ids = RNG.integers(0, cfg.vocab_size, (2, seq)).astype(np.int32)
    mask = np.ones((2, seq), dtype=bool)
    pos = np.tile(np.arange(seq), (2, 1))

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(pos), None, None)
    merged = dict(init["params"])
    converted = convert_decoder(sd, cfg)
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        converted["lm_head"] = {"kernel": sd["lm_head.weight"].T}
    merged.update(jax.tree.map(jnp.asarray, converted))

    ours = np.asarray(model.apply({"params": merged}, jnp.asarray(ids),
                                  jnp.asarray(mask), jnp.asarray(pos), None, None))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=atol)


def test_phi3_parity():
    from transformers import Phi3Config, Phi3ForCausalLM

    hf_cfg = Phi3Config(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=256,
        sliding_window=None, tie_word_embeddings=False,
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    hf = Phi3ForCausalLM(hf_cfg).eval()
    cfg = CambrianConfig(
        model_type="phi3", vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, hidden_act="silu",
        **_COMMON_VISION,
    )
    _run_parity(hf, cfg)


@pytest.mark.parametrize("seq", [12, 40])  # 12 < orig=32 < 40: short vs long factors
def test_phi3_longrope_parity(seq):
    from transformers import Phi3Config, Phi3ForCausalLM

    short = list(RNG.uniform(1.0, 1.2, 8))
    long = list(RNG.uniform(2.0, 4.0, 8))
    hf_cfg = Phi3Config(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=64, original_max_position_embeddings=32,
        rope_scaling={"type": "longrope", "short_factor": short,
                      "long_factor": long},
        sliding_window=None, tie_word_embeddings=False,
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    hf = Phi3ForCausalLM(hf_cfg).eval()
    cfg = CambrianConfig(
        model_type="phi3", vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, hidden_act="silu",
        max_position_embeddings=64, original_max_position_embeddings=32,
        rope_scaling={"type": "longrope", "short_factor": short,
                      "long_factor": long},
        **_COMMON_VISION,
    )
    _run_parity(hf, cfg, seq=seq)


def test_mistral_parity_with_sliding_window():
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=8,
        tie_word_embeddings=False,
    )
    hf = MistralForCausalLM(hf_cfg).eval()
    cfg = CambrianConfig(
        model_type="mistral", vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=8,
        **_COMMON_VISION,
    )
    _run_parity(hf, cfg, seq=16)  # seq > window exercises the banded mask


def test_gemma_parity():
    from transformers import GemmaConfig, GemmaForCausalLM

    hf_cfg = GemmaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=True, hidden_activation="gelu_pytorch_tanh",
    )
    hf = GemmaForCausalLM(hf_cfg).eval()
    cfg = CambrianConfig(
        model_type="gemma", vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=True, hidden_act="gelu_pytorch_tanh",
        **_COMMON_VISION,
    )
    _run_parity(hf, cfg, atol=2e-4)


def test_cohere_parity():
    from transformers import CohereConfig, CohereForCausalLM

    hf_cfg = CohereConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        layer_norm_eps=1e-5, rope_theta=10000.0, logit_scale=0.0625,
        tie_word_embeddings=True, use_qk_norm=False,
    )
    hf = CohereForCausalLM(hf_cfg).eval()
    cfg = CambrianConfig(
        model_type="cohere", vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, logit_scale=0.0625,
        tie_word_embeddings=True, use_qk_norm=False,
        **_COMMON_VISION,
    )
    _run_parity(hf, cfg)


def test_softcapping_math():
    """Gemma-2 logit softcapping: cap*tanh(x/cap) on attention logits
    (ops/attention.py) and on final logits (cambrian.py::_logits)."""
    import numpy as np

    from cambrian_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((1, 4, 2, 8)).astype(np.float32)) * 4
    k = jnp.asarray(rng.standard_normal((1, 4, 2, 8)).astype(np.float32)) * 4
    v = jnp.asarray(rng.standard_normal((1, 4, 2, 8)).astype(np.float32))
    capped = dot_product_attention(q, k, v, logit_cap=5.0)
    uncapped = dot_product_attention(q, k, v)
    assert not np.allclose(np.asarray(capped), np.asarray(uncapped))
    # manual reference
    logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(8)
    logits = 5.0 * np.tanh(logits / 5.0)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", probs, np.asarray(v))
    np.testing.assert_allclose(np.asarray(capped), ref, rtol=1e-5, atol=1e-6)


def test_final_logit_softcapping_forward():
    cfg = CambrianConfig(
        model_type="gemma", vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, tie_word_embeddings=True,
        hidden_act="gelu_pytorch_tanh", attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        **_COMMON_VISION,
    )
    import numpy as np

    from cambrian_tpu.models.cambrian import CambrianLM

    model = CambrianLM(cfg, (32,))
    ids = np.full((1, 8), 3, dtype=np.int32)
    mask = np.ones((1, 8), bool)
    pos = np.arange(8, dtype=np.int32)[None]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask), jnp.asarray(pos), None, None)
    logits = model.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                         jnp.asarray(pos), None, None)
    arr = np.asarray(logits)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() <= 30.0 + 1e-4
