from .packing import (
    get_padding_offset,
    insert_dummy_image,
    prepare_aux_masks,
    prepare_image_info,
    prepare_multimodal_data,
)
