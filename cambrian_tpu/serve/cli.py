"""Interactive REPL chat with streaming (reference serve/cli.py:27-126)."""

import argparse

import numpy as np

from ..constants import DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN, DEFAULT_IMAGE_TOKEN
from ..conversation import SeparatorStyle, conv_templates
from ..mm_utils import (
    get_model_name_from_path,
    process_images,
    tokenizer_image_token,
    tokenizer_image_token_llama3,
)
from ..models.builder import load_pretrained_model


def load_image(image_file):
    from io import BytesIO

    from PIL import Image

    if image_file.startswith(("http://", "https://")):
        import requests

        response = requests.get(image_file, timeout=30)
        return Image.open(BytesIO(response.content)).convert("RGB")
    return Image.open(image_file).convert("RGB")


def main(args):
    if args.device and args.device != "tpu":
        import jax

        jax.config.update("jax_platforms", args.device)
    model_name = get_model_name_from_path(args.model_path)
    tokenizer, model, image_processor, context_len = load_pretrained_model(
        args.model_path, args.model_base, model_name,
        args.load_8bit, args.load_4bit, device=args.device,
    )

    if args.conv_mode is not None:
        conv_mode = args.conv_mode
    elif "llama3" in model_name.lower() or "llama-3" in model_name.lower():
        conv_mode = "llama_3"
    elif "phi3" in model_name.lower():
        conv_mode = "phi3"
    elif "34b" in model_name.lower() or "yi" in model_name.lower():
        conv_mode = "chatml_direct"
    else:
        conv_mode = "vicuna_v1"

    conv = conv_templates[conv_mode].copy()
    roles = conv.roles

    image = load_image(args.image_file)
    image_size = image.size
    image_tensor = process_images([image], image_processor, model.config)

    first_turn = True
    while True:
        try:
            inp = input(f"{roles[0]}: ")
        except EOFError:
            inp = ""
        if not inp:
            print("exit...")
            break

        print(f"{roles[1]}: ", end="", flush=True)
        if image is not None and first_turn:
            if model.config.mm_use_im_start_end:
                inp = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
                       + DEFAULT_IM_END_TOKEN + "\n" + inp)
            else:
                inp = DEFAULT_IMAGE_TOKEN + "\n" + inp
            first_turn = False
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        tok_fn = tokenizer_image_token_llama3 if conv_mode == "llama_3" \
            else tokenizer_image_token
        input_ids = np.asarray(tok_fn(prompt, tokenizer), dtype=np.int64)

        prev = ""
        out_ids = None
        for out_ids in model.generate_stream(
            input_ids,
            images=image_tensor if not first_turn else None,
            image_sizes=[image_size],
            do_sample=args.temperature > 0,
            temperature=args.temperature,
            max_new_tokens=args.max_new_tokens,
        ):
            text = tokenizer.decode(out_ids[0], skip_special_tokens=True)
            stop = conv.sep if conv.sep_style == SeparatorStyle.SINGLE else conv.sep2
            if stop and stop in text:
                text = text[: text.index(stop)]
                print(text[len(prev):], end="", flush=True)
                prev = text
                break
            print(text[len(prev):], end="", flush=True)
            prev = text
        print()
        conv.messages[-1][-1] = prev

        if args.debug:
            print("\n", {"prompt": prompt, "outputs": prev}, "\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--image-file", type=str, required=True)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--conv-mode", type=str, default=None)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--max-new-tokens", type=int, default=512)
    parser.add_argument("--load-8bit", action="store_true")
    parser.add_argument("--load-4bit", action="store_true")
    parser.add_argument("--debug", action="store_true")
    main(parser.parse_args())
