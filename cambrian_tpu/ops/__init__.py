from .attention import dot_product_attention
from .norms import layer_norm, rms_norm
from .resize import resize_bilinear
