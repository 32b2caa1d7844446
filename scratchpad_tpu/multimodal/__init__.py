from scratchpad_tpu.multimodal.image import (  # noqa: F401
    decode_image,
    preprocess_clip,
)
