"""Tests for host-side multimodal utilities (cambrian_tpu/mm_utils.py)."""

import numpy as np
import pytest

from cambrian_tpu.constants import IMAGE_TOKEN_INDEX
from cambrian_tpu.mm_utils import (
    ImageProcessor,
    expand2square,
    get_model_name_from_path,
    process_images,
    select_best_resolution,
    tokenizer_image_token,
    tokenizer_image_token_llama3,
)


class FakeTokenizerOutput:
    def __init__(self, ids):
        self.input_ids = ids


class FakeTokenizer:
    """Whitespace tokenizer with BOS=1; token id = 10 + word length."""

    bos_token_id = 1

    def __call__(self, text):
        ids = [self.bos_token_id] + [10 + len(w) for w in text.split()]
        return FakeTokenizerOutput(ids)


class FakeTokenizerNoBos(FakeTokenizer):
    def __call__(self, text):
        return FakeTokenizerOutput([10 + len(w) for w in text.split()])


def test_tokenizer_image_token_bos():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("hi there <image> world", tok)
    # BOS kept once; chunks spliced around -200
    assert ids[0] == 1
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids.count(1) == 1
    # structure: [bos, hi, there, IMG, world]
    assert ids == [1, 12, 15, IMAGE_TOKEN_INDEX, 15]


def test_tokenizer_image_token_no_bos():
    tok = FakeTokenizerNoBos()
    ids = tokenizer_image_token("a <image> bb", tok)
    assert ids == [11, IMAGE_TOKEN_INDEX, 12]


def test_tokenizer_image_token_llama3():
    tok = FakeTokenizerNoBos()
    ids = tokenizer_image_token_llama3("a <image> bb", tok)
    assert ids == [11, IMAGE_TOKEN_INDEX, 12]


def test_tokenizer_image_token_multiple_images():
    tok = FakeTokenizerNoBos()
    ids = tokenizer_image_token("a <image> b <image> c", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 2


def test_expand2square():
    PIL = pytest.importorskip("PIL.Image")
    img = PIL.new("RGB", (100, 50), (255, 0, 0))
    sq = expand2square(img, (0, 0, 0))
    assert sq.size == (100, 100)
    # original pasted vertically centered
    assert sq.getpixel((50, 50)) == (255, 0, 0)
    assert sq.getpixel((50, 10)) == (0, 0, 0)


def test_process_images_shapes():
    PIL = pytest.importorskip("PIL.Image")
    img = PIL.new("RGB", (123, 77), (128, 64, 32))
    procs = [ImageProcessor(size=32), ImageProcessor(size=64)]
    out = process_images([img, img], procs)
    assert len(out) == 2
    assert out[0].shape == (2, 3, 32, 32)
    assert out[1].shape == (2, 3, 64, 64)
    assert out[0].dtype == np.float32


def test_image_processor_normalization():
    PIL = pytest.importorskip("PIL.Image")
    img = PIL.new("RGB", (8, 8), (255, 255, 255))
    proc = ImageProcessor(size=8, image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5))
    arr = proc.preprocess(img)["pixel_values"][0]
    np.testing.assert_allclose(arr, 1.0, atol=1e-6)


def test_get_model_name_from_path():
    assert get_model_name_from_path("/a/b/cambrian-8b") == "cambrian-8b"
    assert get_model_name_from_path("/a/cambrian-8b/checkpoint-100") == "cambrian-8b_checkpoint-100"


def test_select_best_resolution():
    assert select_best_resolution((800, 600), [(672, 672), (1344, 672)]) == (1344, 672)


def test_keywords_stopping_criteria():
    """Stop-at-keyword semantics (reference mm_utils.py:252-284): token-level
    tail match, text-level decoded match within the keyword-sized window, and
    batch-AND across rows."""
    import numpy as np

    from cambrian_tpu.mm_utils import KeywordsStoppingCriteria

    class FakeTok:
        bos_token_id = 1

        def __call__(self, text):
            class R:
                pass
            r = R()
            # "</s>" -> [1, 9]; anything else -> [1, 7, 8]
            r.input_ids = [1, 9] if text == "</s>" else [1, 7, 8]
            return r

        def batch_decode(self, rows, skip_special_tokens=True):
            return ["</s>" if 9 in np.asarray(r) else "xx" for r in rows]

    prompt = np.asarray([[1, 5, 6]])
    crit = KeywordsStoppingCriteria(["</s>"], FakeTok(), prompt)
    assert crit.max_keyword_len == 1          # BOS stripped from keyword ids
    assert not crit(np.asarray([[1, 5, 6, 4]]))      # no keyword
    assert crit(np.asarray([[1, 5, 6, 9]]))          # token-level tail hit
    assert not crit(np.asarray([[1, 5, 6]]))         # nothing generated yet
    # batch-AND: stops only when every row has hit
    both = np.asarray([[1, 5, 6, 9], [1, 5, 6, 4]])
    assert not crit(both)
    assert crit(np.asarray([[1, 5, 6, 9], [1, 5, 6, 9]]))
