"""Label-masking parity against the REFERENCE preprocessors.

train_fsdp.py cannot be imported (torch_xla at module level), so the
preprocess_* function definitions are extracted by AST and executed against
the reference's own conversation/mm_utils modules plus torch-cpu. Our numpy
preprocessors must produce identical input_ids and labels.
"""

import ast
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import copy

from cambrian_tpu import conversation as our_conversation
from cambrian_tpu.data import preprocess as our_preprocess

REF_DIR = "/root/reference/cambrian"

_WANTED = {
    "preprocess_llama_3", "preprocess_llama_2", "preprocess_v1",
    "preprocess_mpt", "preprocess_phi3", "preprocess_plain",
}


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_env():
    # the reference's own primitives (pure-python imports only)
    ref_conv = _load_module("ref_conv_pp", f"{REF_DIR}/conversation.py")

    # mm_utils needs cambrian.constants + cambrian.utils; fake the package
    fake_pkg = types.ModuleType("cambrian")
    constants = _load_module("cambrian.constants", f"{REF_DIR}/constants.py")
    fake_utils = types.ModuleType("cambrian.utils")
    fake_utils.IS_XLA_AVAILABLE = False
    sys.modules["cambrian"] = fake_pkg
    sys.modules["cambrian.utils"] = fake_utils
    fake_pkg.constants = constants
    fake_pkg.utils = fake_utils
    ref_mm = _load_module("ref_mm_utils_pp", f"{REF_DIR}/mm_utils.py")

    # extract the preprocess functions from train_fsdp.py by AST
    with open(f"{REF_DIR}/train/train_fsdp.py") as f:
        tree = ast.parse(f.read())
    selected = [n for n in tree.body
                if isinstance(n, ast.FunctionDef) and n.name in _WANTED]
    assert len(selected) == len(_WANTED)
    module = ast.Module(body=selected, type_ignores=[])
    code = compile(module, "train_fsdp_extract", "exec")
    env = {
        "torch": torch,
        "copy": copy,
        "transformers": __import__("transformers"),
        "conversation_lib": ref_conv,
        "tokenizer_image_token": ref_mm.tokenizer_image_token,
        "tokenizer_image_token_llama3": ref_mm.tokenizer_image_token_llama3,
        "IGNORE_INDEX": constants.IGNORE_INDEX,
        "IMAGE_TOKEN_INDEX": constants.IMAGE_TOKEN_INDEX,
        "DEFAULT_IMAGE_TOKEN": constants.DEFAULT_IMAGE_TOKEN,
        "IS_TOKENIZER_GREATER_THAN_0_14": True,
        "print_rank0": print,
        "Dict": dict, "Sequence": list,
    }
    exec(code, env)
    return ref_conv, env


@pytest.fixture(scope="module")
def tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        special_tokens=["<unk>", "<s>", "</s>", "<|eot_id|>",
                        "<|start_header_id|>", "<|end_header_id|>",
                        "<|im_start|>", "<|im_end|>", "<|end|>", "<|user|>",
                        "<|assistant|>", "<|system|>", "[INST]", "[/INST]"],
        vocab_size=600,
    )
    corpus = [
        "You are Cambrian a highly intelligent multimodal AI assistant",
        "What is in this image? A cat sitting on a mat.",
        "describe the picture please user assistant system helpful honest",
    ] * 30
    tok.train_from_iterator(corpus, trainer)
    t = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>")
    t.pad_token = t.eos_token
    t.model_max_length = 512
    t.legacy = False
    return t


SOURCES = [[
    {"from": "human", "value": "<image>\nWhat is in this image?"},
    {"from": "gpt", "value": "A cat sitting on a mat."},
    {"from": "human", "value": "describe the picture please"},
    {"from": "gpt", "value": "helpful honest assistant"},
]]

CASES = [
    ("llama_3", "preprocess_llama_3", "preprocess_llama_3"),
    ("llama_2", "preprocess_llama_2", "preprocess_llama_2"),
    ("v1", "preprocess_v1", "preprocess_v1"),
    ("mpt", "preprocess_mpt", "preprocess_mpt"),
    ("phi3", "preprocess_phi3", "preprocess_phi3"),
]


@pytest.mark.parametrize("version,ref_fn,our_fn", CASES)
@pytest.mark.parametrize("has_image", [True, False])
def test_masking_matches_reference(ref_env, tokenizer, version, ref_fn,
                                   our_fn, has_image):
    ref_conv, env = ref_env
    ref_conv.default_conversation = ref_conv.conv_templates[version]
    our_conversation.default_conversation = our_conversation.conv_templates[version]

    srcs = copy.deepcopy(SOURCES)
    if not has_image:
        srcs[0][0]["value"] = srcs[0][0]["value"].replace("<image>\n", "")

    ref_out = env[ref_fn](copy.deepcopy(srcs), tokenizer, has_image=has_image)
    our_out = getattr(our_preprocess, our_fn)(copy.deepcopy(srcs), tokenizer,
                                              has_image=has_image)

    ref_ids = np.asarray(ref_out["input_ids"][0])
    ref_labels = np.asarray(ref_out["labels"][0])
    np.testing.assert_array_equal(our_out["input_ids"][0], ref_ids,
                                  err_msg=f"{version} input_ids")
    np.testing.assert_array_equal(our_out["labels"][0], ref_labels,
                                  err_msg=f"{version} labels")


def test_plain_matches_reference(ref_env, tokenizer):
    ref_conv, env = ref_env
    ref_conv.default_conversation = ref_conv.conv_templates["plain"]
    our_conversation.default_conversation = our_conversation.conv_templates["plain"]
    srcs = [[
        {"from": "human", "value": "<image>"},
        {"from": "gpt", "value": "A cat sitting on a mat."},
    ]]
    ref_out = env["preprocess_plain"](copy.deepcopy(srcs), tokenizer)
    our_out = our_preprocess.preprocess_plain(copy.deepcopy(srcs), tokenizer)
    np.testing.assert_array_equal(our_out["input_ids"][0],
                                  np.asarray(ref_out["input_ids"][0]))
    np.testing.assert_array_equal(our_out["labels"][0],
                                  np.asarray(ref_out["labels"][0]))
