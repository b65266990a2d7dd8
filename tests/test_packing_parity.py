"""Packing-geometry parity against the REFERENCE implementation, with the
functions (get_padding_offset / prepare_image_info / prepare_multimodal_data)
AST-extracted from train_fsdp.py and run on torch-cpu. The token geometry is
checkpoint-critical (SURVEY.md §7 hard-part 1)."""

import ast
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cambrian_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from cambrian_tpu.data import packing as ours

REF = "/root/reference/cambrian/train/train_fsdp.py"
_WANTED = {"get_padding_offset", "prepare_image_info", "prepare_multimodal_data"}


@pytest.fixture(scope="module")
def ref_env():
    with open(REF) as f:
        tree = ast.parse(f.read())
    selected = [n for n in tree.body
                if isinstance(n, ast.FunctionDef) and n.name in _WANTED]
    assert len(selected) == len(_WANTED)
    code = compile(ast.Module(body=selected, type_ignores=[]),
                   "train_fsdp_packing", "exec")
    env = {"torch": torch, "IGNORE_INDEX": IGNORE_INDEX,
           "IMAGE_TOKEN_INDEX": IMAGE_TOKEN_INDEX}
    exec(code, env)
    return env


SIZES = [(640, 640), (1000, 500), (500, 1000), (123, 457), (1, 1),
         (3000, 17), (17, 3000), (640, 360)]


@pytest.mark.parametrize("size", SIZES)
def test_padding_offset_parity(ref_env, size):
    assert ours.get_padding_offset((24, 24), size) == \
        ref_env["get_padding_offset"]((24, 24), size)


@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("newline", [False, True])
def test_prepare_image_info_parity(ref_env, size, newline):
    m_ref, p_ref = ref_env["prepare_image_info"](size, 576, newline=newline)
    m_ours, p_ours = ours.prepare_image_info(size, 576, newline=newline)
    np.testing.assert_array_equal(m_ours, m_ref.numpy())
    np.testing.assert_array_equal(p_ours, p_ref.numpy())


@pytest.mark.parametrize("size", [(640, 640), (1000, 500), (123, 457)])
def test_prepare_multimodal_data_parity(ref_env, size):
    rng = np.random.default_rng(3)
    b, seq, image_pos = 2, 48, 7
    image_token_len = 16
    aux_lens = [16, 64, 256]
    max_len = 96

    ids = rng.integers(100, 200, (b, seq)).astype(np.int64)
    ids[:, image_pos] = IMAGE_TOKEN_INDEX
    labels = rng.integers(100, 200, (b, seq)).astype(np.int64)
    mask = np.ones((b, seq), dtype=bool)
    mask[:, -3:] = False  # tail padding

    ref_out = ref_env["prepare_multimodal_data"](
        torch.from_numpy(ids), torch.from_numpy(labels),
        torch.from_numpy(mask), [size] * b, image_token_len, aux_lens, max_len,
    )
    our_out = ours.prepare_multimodal_data(
        ids, labels, mask, [size] * b, image_token_len, aux_lens, max_len,
    )
    names = ["input_ids", "labels", "attention_mask", "position_ids"]
    for name, r, o in zip(names, ref_out[:4], our_out[:4]):
        np.testing.assert_array_equal(np.asarray(o), r.numpy(),
                                      err_msg=f"{name} @ {size}")
    for i, (r, o) in enumerate(zip(ref_out[4], our_out[4])):
        np.testing.assert_array_equal(np.asarray(o), r.numpy(),
                                      err_msg=f"aux_mask[{i}] @ {size}")


def test_prepare_multimodal_data_parity_masked_image(ref_env):
    """Dummy-image sample: the indicator slot itself is attention-masked."""
    b, seq, image_pos = 1, 32, 5
    ids = np.arange(100, 132, dtype=np.int64)[None].copy()
    labels = ids.copy()
    mask = np.ones((1, seq), dtype=bool)
    ids, labels, mask = (x[0] for x in (ids, labels, mask))
    ids, labels, mask = ours.insert_dummy_image(ids, labels, mask, image_pos)
    ids, labels, mask = ids[None], labels[None], mask[None]

    ref_out = ref_env["prepare_multimodal_data"](
        torch.from_numpy(ids), torch.from_numpy(labels),
        torch.from_numpy(mask), [(64, 64)], 16, [16], 51,
    )
    our_out = ours.prepare_multimodal_data(
        ids, labels, mask, [(64, 64)], 16, [16], 51,
    )
    for r, o in zip(ref_out[:4], our_out[:4]):
        np.testing.assert_array_equal(np.asarray(o), r.numpy())
