"""Unit tests for the static-shape multimodal packing geometry
(cambrian_tpu/data/packing.py), the math that defines checkpoint-compatible
token layout (reference train_fsdp.py:1039-1165)."""

import numpy as np
import pytest

from cambrian_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from cambrian_tpu.data.packing import (
    get_padding_offset,
    insert_dummy_image,
    prepare_aux_masks,
    prepare_image_info,
    prepare_multimodal_data,
)


def test_get_padding_offset_square():
    assert get_padding_offset((24, 24), (500, 500)) == (0, 0, 0, 0)


def test_get_padding_offset_wide():
    # width > height: letterboxed top/bottom. 1000x500 in 24x24:
    # new_height = int(500 * 24/1000) = 12, padding = (24-12)//2 = 6
    assert get_padding_offset((24, 24), (1000, 500)) == (0, 0, 6, 6)


def test_get_padding_offset_tall():
    # height > width: pillarboxed left/right
    assert get_padding_offset((24, 24), (500, 1000)) == (6, 6, 0, 0)


def test_prepare_image_info_square():
    mask, pos = prepare_image_info((640, 640), 576)
    assert mask.shape == (576,)
    assert mask.all()
    np.testing.assert_array_equal(pos, np.arange(576))


def test_prepare_image_info_wide_no_newline():
    mask, pos = prepare_image_info((1000, 500), 576)
    grid = mask.reshape(24, 24)
    assert not grid[:6].any() and not grid[-6:].any()
    assert grid[6:18].all()
    # positions advance only on valid tokens
    assert pos.max() == mask.sum() - 1


def test_prepare_image_info_newline_column():
    # pillarboxed image: newline column (last of 25) must stay valid in valid rows
    mask, pos = prepare_image_info((500, 1000), 576, newline=True)
    grid = mask.reshape(24, 25)
    assert grid[:, 24].all()  # newline column valid everywhere (no top/bottom pad)
    assert not grid[:, :6].any()
    assert not grid[:, 18:24].any()
    assert grid[:, 6:18].all()


def test_prepare_image_info_newline_top_bottom():
    mask, _ = prepare_image_info((1000, 500), 576, newline=True)
    grid = mask.reshape(24, 25)
    # letterboxed rows are fully masked including the newline token
    assert not grid[:6].any() and not grid[-6:].any()
    assert grid[6:18].all()


def test_prepare_aux_masks_windowing():
    # aux 48x48 grid, base 24 -> each query owns a 2x2 window
    (mask,) = prepare_aux_masks((1000, 500), 576, [48 * 48])
    assert mask.shape == (576, 4)
    # top 6 query rows correspond to aux rows 0..11 -> all padded, but
    # all-invalid rows must be force-unmasked
    assert mask[: 6 * 24].all()
    # center rows fully valid
    assert mask[12 * 24: 13 * 24].all()


def test_prepare_aux_masks_partial_window():
    # 1000x750 in 48x48: new_height=int(750*48/1000)=36, padding=(48-36)//2=6
    # -> aux rows 0-5 and 42-47 invalid. Query row 2 (aux rows 4,5) fully
    # invalid -> forced True. Query row 3 (aux rows 6,7) fully valid.
    (mask,) = prepare_aux_masks((1000, 750), 576, [48 * 48])
    w = mask.reshape(24, 24, 4)
    assert w[2].all()  # forced unmask
    assert w[3].all()  # genuinely valid


def _toy_batch(seq_len=32, image_pos=5):
    ids = np.arange(100, 100 + seq_len, dtype=np.int64)
    ids[image_pos] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    mask = np.ones(seq_len, dtype=bool)
    return ids[None], labels[None], mask[None]


def test_prepare_multimodal_data_geometry():
    image_token_len = 16  # 4x4 grid, side 4, block 20
    block = 16 + 4
    seq_len, image_pos = 32, 5
    ids, labels, mask = _toy_batch(seq_len, image_pos)
    max_length = seq_len + block - 1
    new_ids, new_labels, new_mask, new_pos, aux = prepare_multimodal_data(
        ids, labels, mask, [(640, 640)], image_token_len, [16], max_length
    )
    assert new_ids.shape == (1, max_length)
    # image indicator kept at image_pos, then block-1 zeros
    assert new_ids[0, image_pos] == IMAGE_TOKEN_INDEX
    assert (new_ids[0, image_pos + 1: image_pos + block] == 0).all()
    # labels ignored across the whole block
    assert (new_labels[0, image_pos: image_pos + block] == IGNORE_INDEX).all()
    # square image: every block token valid; positions continue seamlessly
    assert new_mask[0].all()
    np.testing.assert_array_equal(new_pos[0], np.arange(max_length))
    # text resumes after the block with original ids
    assert new_ids[0, image_pos + block] == 100 + image_pos + 1
    assert aux[0].shape == (1, 16, 1)


def test_prepare_multimodal_data_padded_image_positions():
    image_token_len = 16
    ids, labels, mask = _toy_batch(32, 5)
    new_ids, new_labels, new_mask, new_pos, _ = prepare_multimodal_data(
        ids, labels, mask, [(1000, 500)], image_token_len, [16], 64
    )
    # wide image in a 4x4 grid: top/bottom 1 row padded -> 2*5=10 invalid slots
    im_mask, im_pos = new_mask[0, 5:25], new_pos[0, 5:25]
    assert im_mask.sum() == 10
    # position ids of the text after the image continue from max+1
    assert new_pos[0, 25] == im_pos.max() + 1
    # invalid slots don't advance positions
    assert new_pos[0, 24] == im_pos.max()


def test_insert_dummy_image():
    seq_len, image_pos = 16, 4
    ids = np.arange(seq_len, dtype=np.int64)
    labels = ids.copy()
    mask = np.ones(seq_len, dtype=bool)
    new_ids, new_labels, new_mask = insert_dummy_image(ids, labels, mask, image_pos)
    assert new_ids[image_pos] == IMAGE_TOKEN_INDEX
    assert new_labels[image_pos] == IGNORE_INDEX
    assert not new_mask[image_pos]
    # tail shifted right by one, last token dropped
    np.testing.assert_array_equal(new_ids[image_pos + 1:], ids[image_pos:-1])
