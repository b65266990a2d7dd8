"""Training data pipeline tests: preprocessors' label masking, indexed JSONL
dataset, collator geometry, and modality-grouped sampler."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from cambrian_tpu import conversation as conversation_lib
from cambrian_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from cambrian_tpu.data.dataset import (
    DataCollatorForSupervisedDataset,
    LazySupervisedDataset,
    LengthGroupedSampler,
    get_modality_length_grouped_indices,
)
from cambrian_tpu.data.preprocess import (
    preprocess,
    preprocess_llama_3,
    preprocess_multimodal,
    preprocess_plain,
    set_default_conversation,
)


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        special_tokens=["<unk>", "<s>", "</s>", "<|eot_id|>",
                        "<|start_header_id|>", "<|end_header_id|>"],
        vocab_size=500,
    )
    corpus = [
        "You are Cambrian a highly intelligent multimodal AI",
        "What is in this image? A cat sitting on a mat.",
        "describe the picture please user assistant system",
    ] * 30
    tok.train_from_iterator(corpus, trainer)
    t = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>", unk_token="<unk>",
        additional_special_tokens=["<|eot_id|>", "<|start_header_id|>",
                                   "<|end_header_id|>"],
    )
    t.pad_token = t.eos_token
    t.model_max_length = 512
    return t


SOURCES = [[
    {"from": "human", "value": "<image>\nWhat is in this image?"},
    {"from": "gpt", "value": "A cat sitting on a mat."},
    {"from": "human", "value": "describe the picture please"},
    {"from": "gpt", "value": "system user assistant"},
]]


def test_llama3_masking(tokenizer):
    set_default_conversation("llama_3")
    import copy

    out = preprocess_llama_3(copy.deepcopy(SOURCES), tokenizer, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids.shape == labels.shape
    # image token spliced
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    # the image token (user round) is never supervised
    assert labels[ids == IMAGE_TOKEN_INDEX][0] == IGNORE_INDEX
    # some assistant tokens are supervised
    supervised = labels != IGNORE_INDEX
    assert supervised.sum() > 0
    # supervised positions must carry the same ids as inputs
    np.testing.assert_array_equal(ids[supervised], labels[supervised])
    # system prompt region fully masked (prefix before first user round)
    sys_len = len(tokenizer(
        "<|begin_of_text|><|start_header_id|>system<|end_header_id|>x").input_ids)
    assert (labels[:4] == IGNORE_INDEX).all()


def test_plain_masking(tokenizer):
    set_default_conversation("plain")
    sources = [[
        {"from": "human", "value": "<image>"},
        {"from": "gpt", "value": "A cat sitting on a mat."},
    ]]
    out = preprocess_plain(sources, tokenizer)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[0] == IMAGE_TOKEN_INDEX
    assert labels[0] == IGNORE_INDEX
    assert (labels[1:] != IGNORE_INDEX).sum() > 0
    np.testing.assert_array_equal(ids[labels != IGNORE_INDEX],
                                  labels[labels != IGNORE_INDEX])


def test_preprocess_multimodal_normalizes_image_position():
    set_default_conversation("llama_3")

    class Args:
        is_multimodal = True
        mm_use_im_start_end = False

    src = [[{"from": "human", "value": "What is this? <image>"}]]
    out = preprocess_multimodal(src, Args())
    assert out[0][0]["value"].startswith("<image>\n")


def test_dispatcher_styles(tokenizer):
    import copy
    for version in ["llama_3", "v1", "phi3", "mpt", "llama_2"]:
        set_default_conversation(version)
        out = preprocess(copy.deepcopy(SOURCES), tokenizer, has_image=True)
        ids, labels = out["input_ids"][0], out["labels"][0]
        assert ids.shape == labels.shape, version
        sup = labels != IGNORE_INDEX
        np.testing.assert_array_equal(ids[sup], labels[sup], err_msg=version)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory, tokenizer):
    from PIL import Image

    d = tmp_path_factory.mktemp("data")
    img_dir = d / "images"
    img_dir.mkdir()
    Image.new("RGB", (64, 40), (200, 30, 40)).save(img_dir / "img0.jpg")
    records = [
        {"id": "0", "image": "img0.jpg", "conversations": [
            {"from": "human", "value": "<image>\nWhat is in this image?"},
            {"from": "gpt", "value": "A cat sitting on a mat."},
        ]},
        {"id": "1", "conversations": [
            {"from": "human", "value": "What is a cat?"},
            {"from": "gpt", "value": "A cat is a small animal."},
        ]},
    ] * 4
    path = d / "train.jsonl"
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(path), str(img_dir)


class DataArgs:
    def __init__(self, path, folder):
        from cambrian_tpu.mm_utils import ImageProcessor

        self.data_path = path
        self.image_folder = folder
        self.is_multimodal = True
        self.mm_use_im_start_end = False
        self.image_processor_aux_list = [ImageProcessor(size=32), ImageProcessor(size=64)]


def test_lazy_dataset_jsonl(dataset_dir, tokenizer):
    set_default_conversation("llama_3")
    path, folder = dataset_dir
    ds = LazySupervisedDataset(path, tokenizer, DataArgs(path, folder))
    assert len(ds) == 8
    ml = ds.modality_lengths
    assert ml[0] > 0 and ml[1] < 0  # image vs text-only

    item = ds[0]
    assert (item["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 1
    assert item["image_aux_list"][0].shape == (3, 32, 32)
    assert item["image_aux_list"][1].shape == (3, 64, 64)
    assert item["image_size"] == (64, 40)

    text_item = ds[1]
    assert (text_item["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 0
    assert text_item["image_aux_list"][0].sum() == 0  # dummy zero image


def test_collator_geometry(dataset_dir, tokenizer):
    set_default_conversation("llama_3")
    path, folder = dataset_dir
    tokenizer.model_max_length = 128
    ds = LazySupervisedDataset(path, tokenizer, DataArgs(path, folder))
    collator = DataCollatorForSupervisedDataset(
        tokenizer=tokenizer, image_token_len=16,
        image_aux_token_len_list=[16, 64], image_position=5,
    )
    batch = collator([ds[0], ds[1]])
    b, s = batch["input_ids"].shape
    assert (b, s) == (2, 128)
    assert batch["position_ids"].shape == (2, 128)
    assert batch["aux_masks"][0].shape == (2, 16, 1)
    assert batch["aux_masks"][1].shape == (2, 16, 4)
    assert batch["images"][0].shape == (2, 3, 32, 32)
    # text-only sample: dummy image block fully masked
    im_start = np.argmax(batch["input_ids"][1] == IMAGE_TOKEN_INDEX)
    assert not batch["attention_mask"][1, im_start:im_start + 20].any()
    tokenizer.model_max_length = 512


def test_modality_grouped_sampler():
    lengths = [10, 12, -8, 30, -14, 22, -9, 40, 11, -13, 25, -7]
    idx = get_modality_length_grouped_indices(lengths, batch_size=2, world_size=2,
                                              generator=np.random.default_rng(0))
    assert sorted(idx) == list(range(12))
    sampler = LengthGroupedSampler(batch_size=2, world_size=2, lengths=lengths,
                                   group_by_modality=True,
                                   generator=np.random.default_rng(0))
    assert sorted(iter(sampler)) == list(range(12))
