"""Prompt-template parity: byte-exact prompts vs the reference implementation.

The reference's conversation.py is pure-Python (PIL + stdlib), so we load it
directly and compare rendered prompts for every registered template across
multi-turn conversations. Byte-exact prompts are a hard requirement for
checkpoint parity.
"""

import importlib.util
import sys

import pytest

from cambrian_tpu.conversation import conv_templates

REF_PATH = "/root/reference/cambrian/conversation.py"


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_conversation", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_conversation"] = mod
    spec.loader.exec_module(mod)
    return mod


ref = _load_reference()

TURNS = [
    ("What is in this image?", "A cat sitting on a mat."),
    ("What color is the cat?", "The cat is orange."),
]


@pytest.mark.parametrize("name", sorted(conv_templates.keys()))
def test_prompt_matches_reference(name):
    ours = conv_templates[name].copy()
    theirs = ref.conv_templates[name].copy()

    # PLAIN templates have sep2=None and only ever render a single message
    # (pretrain caption data); a second message raises in the reference too.
    if name in ("plain", "v0_plain"):
        ours.append_message(ours.roles[0], TURNS[0][0])
        theirs.append_message(theirs.roles[0], TURNS[0][0])
    else:
        for user, assistant in TURNS:
            ours.append_message(ours.roles[0], user)
            ours.append_message(ours.roles[1], assistant)
            theirs.append_message(theirs.roles[0], user)
            theirs.append_message(theirs.roles[1], assistant)

    assert ours.get_prompt() == theirs.get_prompt()


@pytest.mark.parametrize("name", sorted(conv_templates.keys()))
def test_prompt_open_turn_matches_reference(name):
    """Generation-style prompt: last assistant turn is open (None)."""
    ours = conv_templates[name].copy()
    theirs = ref.conv_templates[name].copy()

    ours.append_message(ours.roles[0], "<image>\nDescribe the image.")
    ours.append_message(ours.roles[1], None)
    theirs.append_message(theirs.roles[0], "<image>\nDescribe the image.")
    theirs.append_message(theirs.roles[1], None)

    assert ours.get_prompt() == theirs.get_prompt()


def test_image_tuple_message_folding():
    """(text, image, mode) tuples fold <image> into the first turn."""
    ours = conv_templates["llama_3"].copy()
    theirs = ref.conv_templates["llama_3"].copy()
    msg = ("What is here? <image>", object(), "Default")
    ours.append_message(ours.roles[0], msg)
    ours.append_message(ours.roles[1], None)
    theirs.append_message(theirs.roles[0], msg)
    theirs.append_message(theirs.roles[1], None)
    assert ours.get_prompt() == theirs.get_prompt()
