"""cambrian_tpu: a TPU-native (JAX/XLA/Pallas) vision-centric multimodal LLM
framework with the full capabilities of Cambrian-1.

Top-level re-exports mirror the reference package's public surface
(cambrian/__init__.py + the symbols its users import directly).
"""

__version__ = "0.1.0"

from .constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
from .conversation import Conversation, SeparatorStyle, conv_templates, default_conversation
from .mm_utils import (
    KeywordsStoppingCriteria,
    get_model_name_from_path,
    process_images,
    tokenizer_image_token,
    tokenizer_image_token_llama3,
)
