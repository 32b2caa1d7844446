"""Image decoding + CLIP-style preprocessing for VLM requests.

Analogue of the reference's image-processor pool
(reference: scratchpad/managers/image_processor.py:281-479) minus the
process pool — preprocessing is cheap next to the vision-tower forward, and
the TPU engine is single-controller. Accepts the OpenAI chat API's
``image_url`` forms that work offline: ``data:`` URLs, raw base64, and
local file paths.
"""

from __future__ import annotations

import base64
import binascii
import io
import os

import numpy as np

# OpenAI-CLIP normalisation constants (public, used by Llava checkpoints)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_image(src):
    """data: URL | base64 string | local path | PIL.Image -> PIL.Image RGB."""
    from PIL import Image

    if isinstance(src, Image.Image):
        return src.convert("RGB")
    if isinstance(src, (bytes, bytearray)):
        return Image.open(io.BytesIO(src)).convert("RGB")
    if isinstance(src, str):
        if src.startswith("data:"):
            b64 = src.split(",", 1)[1]
            return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        if src.startswith(("http://", "https://")):
            raise ValueError(
                "remote image URLs are not fetched (no egress); send a "
                "data: URL or base64 payload"
            )
        if os.path.exists(src):
            return Image.open(src).convert("RGB")
        try:
            return Image.open(io.BytesIO(base64.b64decode(src))).convert("RGB")
        except (binascii.Error, OSError) as e:
            raise ValueError(f"undecodable image payload: {e}") from None
    raise TypeError(f"unsupported image source {type(src)}")


def preprocess_clip(
    img, image_size: int, mean=CLIP_MEAN, std=CLIP_STD
) -> np.ndarray:
    """Shortest-side resize -> center crop -> normalize; returns [3, S, S]."""
    from PIL import Image

    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize(
        (max(image_size, round(w * scale)), max(image_size, round(h * scale))),
        Image.BICUBIC,
    )
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    x = np.asarray(img, np.float32) / 255.0  # [S, S, 3]
    x = (x - mean) / std
    return x.transpose(2, 0, 1)
